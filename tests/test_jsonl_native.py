"""Native jsonl field extractor: parity with json.loads, fail-safe fallback.

The contract (native/jsonl_fields.cpp): extracted fields must MATCH what the
json.loads loop would produce, and any file the strict C++ parser cannot
handle returns None so callers fall back — the native path can never produce
silently-different contents.
"""
import json
import random
import string

import pytest

from sgpt_tpu.data.jsonl_native import available, extract_fields

pytestmark = pytest.mark.skipif(not available(),
                                reason="native jsonl engine unavailable")


def _write(tmp_path, rows, *, ensure_ascii=True):
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=ensure_ascii) + "\n")
    return str(p)


def _expected(rows, fields):
    out = []
    for r in rows:
        row = []
        for f in fields:
            v = r.get(f)
            row.append(None if v is None or isinstance(v, (dict, list))
                       else (v if isinstance(v, str) else json.dumps(v)))
        out.append(tuple(row))
    return out


FIELDS = ("_id", "title", "text")


def test_basic_rows_and_missing_fields(tmp_path):
    rows = [
        {"_id": "d1", "title": "A Title", "text": "body text"},
        {"_id": "d2", "text": "no title here"},
        {"_id": "d3", "title": "", "text": ""},
        {"text": "no id at all"},
        {},
    ]
    got = extract_fields(_write(tmp_path, rows), FIELDS)
    assert got == _expected(rows, FIELDS)


def test_escapes_and_unicode(tmp_path):
    rows = [
        {"_id": "e1", "title": 'quote " backslash \\ slash /',
         "text": "tab\tnewline\ncr\r bell\b ff\f"},
        {"_id": "e2", "title": "café 中文", "text": "emoji \U0001F600\U0001F680"},
        {"_id": "e3", "title": "ctl", "text": "mixed é中 direct"},
    ]
    for ea in (True, False):  # \uXXXX escapes AND raw UTF-8 bytes
        got = extract_fields(_write(tmp_path, rows, ensure_ascii=ea), FIELDS)
        assert got == _expected(rows, FIELDS)


def test_numbers_bools_null_and_nested_skipping(tmp_path):
    rows = [
        {"_id": 42, "title": "int id", "text": "t"},
        {"_id": -1.5e-3, "title": "float id", "text": "t"},
        {"_id": "d", "title": None, "text": "null title -> missing"},
        {"_id": "n", "title": {"nested": [1, {"a": "b"}]}, "text": "structured -> missing"},
        {"_id": "x", "extra": [1, "two", {"three": [4]}], "meta": {"k": "v"},
         "flag": True, "title": "kept", "text": "kept too"},
    ]
    got = extract_fields(_write(tmp_path, rows), FIELDS)
    exp = _expected(rows, FIELDS)
    # json.dumps(-0.0015) == '-0.0015'; the native path returns the raw
    # token text, which is what the file literally contains
    assert got == exp


def test_blank_lines_and_field_order(tmp_path):
    p = tmp_path / "f.jsonl"
    p.write_text('\n{"text": "t first", "_id": "a", "title": "last"}\n'
                 '   \n{"title": "T", "text": "x", "_id": "b"}\n')
    got = extract_fields(str(p), FIELDS)
    assert got == [("a", "last", "t first"), ("b", "T", "x")]


def test_duplicate_keys_last_wins(tmp_path):
    p = tmp_path / "f.jsonl"
    p.write_text('{"_id": "first", "_id": "second", "text": "t"}\n')
    got = extract_fields(str(p), FIELDS)
    assert got == [("second", None, "t")]  # json.loads keeps the last


@pytest.mark.parametrize("bad", [
    '{"_id": "ok"}\n{broken\n',
    '{"_id": "unterminated\n',
    '{"_id": "x"} trailing\n',
    '["not", "an", "object"]\n',
    '{"_id": "x", "title": "\\ud800 lone surrogate"}\n',
    '{"_id": "x" "missing comma": 1}\n',
])
def test_malformed_returns_none_for_fallback(tmp_path, bad):
    p = tmp_path / "bad.jsonl"
    p.write_text(bad)
    assert extract_fields(str(p), FIELDS) is None


def test_missing_file_returns_none(tmp_path):
    assert extract_fields(str(tmp_path / "nope.jsonl"), FIELDS) is None


def test_fuzz_parity_with_json_loads(tmp_path):
    rng = random.Random(0)
    pool = (string.ascii_letters + string.digits + ' \t"\\/\n\r'
            + "éßñ中文🙂🚀" + "  ")

    def rand_text(n):
        return "".join(rng.choice(pool) for _ in range(rng.randrange(n)))

    rows = []
    for i in range(500):
        row = {"_id": rng.choice([f"doc{i}", i, float(i) / 7])}
        if rng.random() < 0.8:
            row["title"] = rng.choice([rand_text(40), None])
        if rng.random() < 0.95:
            row["text"] = rand_text(200)
        if rng.random() < 0.3:
            row["meta"] = {"depth": [1, {"k": rand_text(10)}], "b": False}
        rows.append(row)
    path = _write(tmp_path, rows, ensure_ascii=bool(rng.random() < 0.5))
    got = extract_fields(path, FIELDS)
    assert got == _expected(rows, FIELDS)


def test_ctypes_backend_parity(tmp_path):
    """The C-ABI/ctypes fallback backend produces identical results to the
    preferred CPython-extension backend (both wrap the same parser core,
    but the bridges differ)."""
    from sgpt_tpu.data import jsonl_native
    try:
        jsonl_native._ensure_ctypes()
    except Exception:
        pytest.skip("ctypes backend unavailable")
    rng = random.Random(1)
    rows = [{"_id": i, "title": None if i % 5 == 0 else f"t{i} é\n",
             "text": "x" * rng.randrange(50), "meta": {"a": [i]}}
            for i in range(200)]
    path = _write(tmp_path, rows, ensure_ascii=False)
    via_ctypes = jsonl_native._extract_ctypes(path, FIELDS)
    assert via_ctypes == extract_fields(path, FIELDS) == _expected(rows, FIELDS)
    # malformed file: ctypes path reports failure as None too
    (tmp_path / "bad.jsonl").write_text("{nope\n")
    assert jsonl_native._extract_ctypes(str(tmp_path / "bad.jsonl"), FIELDS) is None


def test_load_beir_dataset_uses_native(tmp_path, monkeypatch):
    """End-to-end: the BEIR loader produces identical structures through the
    native path and the forced-fallback path."""
    from sgpt_tpu.data import jsonl_native
    from sgpt_tpu.evaluation import beir as beir_mod

    d = tmp_path / "ds"
    (d / "qrels").mkdir(parents=True)
    docs = [{"_id": "d1", "title": "T1", "text": "doc one"},
            {"_id": "d2", "text": "doc two, no title"},
            {"_id": "d3", "title": "", "text": " "}]  # empty -> dropped
    (d / "corpus.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in docs))
    (d / "queries.jsonl").write_text(
        json.dumps({"_id": "q1", "text": "find one"}) + "\n"
        + json.dumps({"_id": "q2", "text": "find two"}) + "\n")
    (d / "qrels" / "test.tsv").write_text(
        "query-id\tcorpus-id\tscore\nq1\td1\t1\nq2\td2\t1\n")

    native = beir_mod.load_beir_dataset(str(d))
    monkeypatch.setattr(jsonl_native, "extract_fields", lambda *a: None)
    fallback = beir_mod.load_beir_dataset(str(d))
    assert native == fallback
    corpus, queries, qrels = native
    assert set(corpus) == {"d1", "d2"} and set(queries) == {"q1", "q2"}
