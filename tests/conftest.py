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
