"""Guard against docs drifting from the CLI flag surface.

README.md and docs/MIGRATION.md show `python -m sgpt_tpu.cli.<mod> --flag ...`
command blocks; a renamed or removed flag would silently break every copy-
pasted migration command. This test extracts each documented command and
asserts (a) the CLI module exists and (b) every `--flag` it uses is defined
by an `add_argument` call in that module's source. Same spirit as the
conftest SLOW-entry guard: stale doc entries must fail loudly, not rot.
"""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI_DIR = os.path.join(REPO, "sgpt_tpu", "cli")
DOCS = ["README.md", os.path.join("docs", "MIGRATION.md"),
        os.path.join("docs", "SERVING.md")]

_ADD_ARG = re.compile(r"""add_argument\(\s*['"](--[A-Za-z0-9_-]+)['"]""")
_CMD = re.compile(r"python -m sgpt_tpu\.cli\.([A-Za-z0-9_]+)(.*)$")
_FLAG = re.compile(r"(--[A-Za-z0-9_-]+)")


def _shared_flags() -> set:
    """Flags contributed by cli/common.py helpers (e.g. add_mesh_args)."""
    with open(os.path.join(CLI_DIR, "common.py")) as f:
        return set(_ADD_ARG.findall(f.read()))


def _module_flags(mod: str) -> set:
    path = os.path.join(CLI_DIR, mod + ".py")
    assert os.path.isfile(path), f"documented CLI module does not exist: sgpt_tpu.cli.{mod}"
    with open(path) as f:
        src = f.read()
    flags = set(_ADD_ARG.findall(src))
    # modules that call a common.py helper inherit its flags
    if re.search(r"add_\w+_args\(", src):
        flags |= _shared_flags()
    return flags


def _documented_commands(doc_path: str):
    """Yield (lineno, module, [flags]) for each command in fenced code blocks."""
    with open(doc_path) as f:
        lines = f.read().splitlines()
    in_fence = False
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.strip().startswith("```"):
            in_fence = not in_fence
            i += 1
            continue
        if in_fence:
            m = _CMD.search(line)
            if m:
                mod, rest = m.group(1), m.group(2)
                start = i
                # join backslash continuations into one logical command
                while rest.rstrip().endswith("\\") and i + 1 < len(lines):
                    i += 1
                    rest = rest.rstrip().rstrip("\\") + " " + lines[i]
                yield start + 1, mod, _FLAG.findall(rest)
        i += 1


def _collect():
    cases = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.isfile(path):
            continue
        for lineno, mod, flags in _documented_commands(path):
            cases.append(pytest.param(doc, lineno, mod, flags,
                                      id=f"{doc}:{lineno}:{mod}"))
    return cases


CASES = _collect()


def test_docs_contain_commands():
    # the guard is useless if extraction silently matches nothing
    assert len(CASES) >= 8, f"expected >=8 documented CLI commands, found {len(CASES)}"


@pytest.mark.parametrize("doc,lineno,mod,flags", CASES)
def test_documented_command_flags_exist(doc, lineno, mod, flags):
    defined = _module_flags(mod)
    unknown = [f for f in flags if f not in defined]
    assert not unknown, (
        f"{doc}:{lineno} documents sgpt_tpu.cli.{mod} with flag(s) {unknown} "
        f"not defined in the module (defined: {sorted(defined)})")
