"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU analog of the reference's multi-device-without-cluster trick
(`tests/test_multi_process.py:10-33` runs the encode pool on ['cpu','cpu']):
`--xla_force_host_platform_device_count=8` gives every test 8 XLA devices so
mesh/pjit/collective paths are exercised without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache makes repeated test runs cheap (compiles dominate).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A TPU-plugin sitecustomize may force jax_platforms to the hardware backend at
# interpreter start; override it back — tests run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# CI shaping (VERDICT r3 #8): the full suite is 445 tests / 28 min on the
# forced-8-device CPU mesh (1-core host), dominated by the heavy mesh/e2e
# drives. Those are auto-marked `slow` here (one maintained list, measured
# with `pytest --durations=60`) and deselected by default via pyproject's
# `addopts = -m "not slow"`. Measured default run: 364 tests in ~6 min on
# the same 1-core host (under concurrent load; faster on any real CI box).
#
#   pytest tests/ -q                        # fast default (CI / driver)
#   pytest tests/ -q -m "slow or not slow"  # everything (nightly-style)
#   pytest tests/ -q -m slow                # only the heavy tail
#
# Entries are "<file>" (whole module) or "<file>::<test-prefix>".
# Measured r4 on the forced-8-device mesh: full suite 445 tests / 28.2 min;
# the entries below carry ~20 min of that, leaving the default gate with at
# least one fast representative per subsystem (mesh coverage stays via
# test_parallel.py + the driver dryrun; kernels via the small-shape cases).
SLOW = {
    # whole modules: every test in them is a heavy mesh/e2e drive
    "test_trainer_mesh.py",            # 220 s: dp×tp fit == single-device
    "test_fuzz_properties.py",         # 130 s: property fuzzers
    "test_long_context_e2e.py",        # 85 s: 2k/8k-token engine encodes
    "test_cli_training.py",            # 58 s: train_nli/msmarco CLI e2e
    "test_flash_backward.py",          # 55 s: Pallas-bwd grad parity sweeps
    "test_bitfit_gradcache.py",        # 30 s: gradcache on the real decoder
    "test_hf_export.py",               # 36 s: round-trip through HF torch
    # heavy tests inside otherwise-fast modules
    "test_training.py::test_gradcache_training",
    "test_training.py::test_dense_heads_train_and_export",
    "test_training.py::test_learned_weightedmean_weights_train",
    "test_training.py::test_checkpointing_and_retention",
    "test_training.py::test_evaluator_and_best_model",
    "test_training.py::test_learned_weights_train_even_under_bitfit",
    "test_training.py::test_bitfit_only_biases_change",
    "test_tsdae.py::test_train_tsdae_cli",
    "test_tsdae.py::test_tsdae_gradients_flow_to_both_paths",
    "test_tsdae.py::test_tsdae_loss_decreases_on_tiny_corpus",
    "test_sequence_parallel.py::test_tsdae_sp_mesh_matches_single_device",
    "test_sequence_parallel.py::test_trainer_sp_mesh_matches_single_device",
    "test_short_attention.py::test_vmem_gates",
    "test_short_attention.py::test_fused_kernel_matches_reference_variants",
    "test_short_attention.py::test_pallas_backward_kernel_matches_reference_vjp",
    "test_short_attention.py::test_pallas_backward_fully_masked_rows",
    "test_short_attention.py::test_fused_trainer_step_runs",
    "test_short_attention.py::test_fused_gradients_match_reference",
    "test_short_attention.py::test_fused_forward_matches_xla",
    "test_ce_packing.py::test_packed_forward_matches_standalone",
    "test_ce_packing.py::test_continuation_scores_packed_matches_gathered",
    "test_ce_packing.py::test_ranker_pack_t_score_equality",
    "test_ce_packing.py::test_ranker_pack_t_mesh_dp",
    "test_index_ivf.py::test_delete_blocks_overflow_pending",
    "test_index_ivf.py::test_sharded_ivf_recall_delete_persist",
    "test_index_ivf.py::test_sharded_probe_cache_invalidates_on_rebuild",
    "test_aggregate_cli.py::test_beir_cli_smoke",
    "test_trainable_ce_datasets.py::test_ce_training_reduces_loss",
    "test_crossencoder.py::test_gathered_scorer_matches_full",
    "test_encoder_retrieval.py::test_encode_token_budget_batching_matches_single",
    "test_models_parity.py::test_clip_encoder_mixed_batch",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    for item in items:
        fname = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        collected_files.add(fname)
        test = item.nodeid.split("::", 1)[1] if "::" in item.nodeid else ""
        slow = False
        if fname in SLOW:
            matched.add(fname)
            slow = True
        for s in SLOW:
            if s.startswith(fname + "::") and test.startswith(s.split("::", 1)[1]):
                matched.add(s)
                slow = True
        if slow:
            item.add_marker(pytest.mark.slow)
    # A typo'd / renamed SLOW entry would silently put a 200s+ test back into
    # the default CI gate (or sit stale forever). Only judge entries whose
    # file was actually collected — a single-file run must not flag the rest.
    stale = {s for s in SLOW - matched
             if s.split("::", 1)[0] in collected_files}
    if stale:
        import warnings
        warnings.warn(
            "conftest SLOW entries matched no collected test (typo or rename"
            " — fix the list): " + ", ".join(sorted(stale)), stacklevel=1)
