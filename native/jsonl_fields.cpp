// jsonl_fields: one-pass extraction of named top-level fields from a JSONL
// file. The host-side data-loader hot path: BEIR corpus.jsonl files reach
// 10M+ rows (sgpt_tpu/evaluation/beir.py:load_beir_dataset,
// sgpt_tpu/cli/serve.py), and a generic json.loads materializes every key of
// every row only to keep three of them. This engine scans each row once,
// unescapes only the requested fields into one contiguous buffer, and skips
// everything else structurally. Parser core: jsonl_core.h (shared with the
// CPython module jsonl_pymod.cpp, which is the faster bridge because it
// creates the Python strings natively).
//
// Correctness contract (tests/test_jsonl_native.py enforces parity with
// Python's json.loads on the extracted fields):
//   * full string unescaping incl. \uXXXX and surrogate pairs -> UTF-8
//   * numbers / true / false are returned as their raw token text; null is
//     missing (json.loads gives Python None)
//   * duplicate keys: LAST occurrence wins (CPython dict semantics)
//   * object/array values for a requested field count as missing
//   * ANY malformed row fails the whole parse (err_line set) -- the Python
//     bridge then falls back to json.loads, so a weird file can never
//     produce silently-different contents.
//
// C ABI (ctypes bridge: sgpt_tpu/data/jsonl_native.py):
//   JResult* jsonl_extract(path, fields, nfields)
//   void     jsonl_result_free(JResult*)
// Cell (row, field) spans bytes [offs[row*nfields+f], +lens[...]) of `bytes`;
// lens -1 = missing. All memory owned by the JResult; free via the API.

#include "jsonl_core.h"

extern "C" {

struct JResult {
  int64_t nrows;
  int32_t nfields;
  char* bytes;      // unescaped cell contents, concatenated
  int64_t nbytes;
  int64_t* offs;    // nrows*nfields byte offsets into `bytes`
  int64_t* lens;    // nrows*nfields lengths; -1 = field missing
  int64_t err_line; // 0 = ok; else 1-based line number of first bad row
};

JResult* jsonl_extract(const char* path, const char** fields, int32_t nfields) {
  auto* res = new JResult();
  res->nfields = nfields;
  if (nfields <= 0) {
    res->err_line = -2;
    return res;
  }

  std::string data;
  if (!jsonl::read_file(path, data)) {
    res->err_line = -1;  // unreadable file
    return res;
  }

  std::vector<std::string> want(fields, fields + nfields);
  std::string arena;
  arena.reserve(data.size() / 2);
  std::vector<int64_t> offs, lens;
  res->err_line = jsonl::extract(data.data(), data.size(), want,
                                 arena, offs, lens);
  if (res->err_line != 0) return res;

  res->nrows = static_cast<int64_t>(offs.size()) / nfields;
  res->nbytes = static_cast<int64_t>(arena.size());
  res->bytes = new char[arena.size() + 1];
  memcpy(res->bytes, arena.data(), arena.size());
  res->bytes[arena.size()] = '\0';
  res->offs = new int64_t[offs.size()];
  memcpy(res->offs, offs.data(), offs.size() * sizeof(int64_t));
  res->lens = new int64_t[lens.size()];
  memcpy(res->lens, lens.data(), lens.size() * sizeof(int64_t));
  return res;
}

void jsonl_result_free(JResult* r) {
  if (!r) return;
  delete[] r->bytes;
  delete[] r->offs;
  delete[] r->lens;
  delete r;
}

}  // extern "C"
