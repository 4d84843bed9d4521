// _jsonl_native: CPython extension over the jsonl parser core.
//
// The ctypes bridge (jsonl_fields.cpp) pays ~2x the parse time again in
// Python-side slicing/decoding when a million rows come back; this module
// materializes the result strings natively (PyUnicode_DecodeUTF8 straight
// from the arena) and releases the GIL for the IO + parse, which is what
// makes the native loader actually faster end-to-end (tools/bench_jsonl.py).
//
//   _jsonl_native.extract_fields(path: str, fields: tuple[str, ...])
//       -> list[tuple[str | None, ...]] | None
//
// Returns None when the file is unreadable or any row fails the strict
// parse — the caller falls back to the json.loads loop (same contract as
// the ctypes bridge; tests/test_jsonl_native.py runs against whichever
// backend the bridge picked).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "jsonl_core.h"

static PyObject* py_extract_fields(PyObject*, PyObject* args) {
  const char* path;
  PyObject* fields_obj;
  if (!PyArg_ParseTuple(args, "sO", &path, &fields_obj)) return nullptr;

  PyObject* fields_seq = PySequence_Fast(fields_obj, "fields must be a sequence");
  if (!fields_seq) return nullptr;
  Py_ssize_t nfields = PySequence_Fast_GET_SIZE(fields_seq);
  if (nfields <= 0) {
    Py_DECREF(fields_seq);
    PyErr_SetString(PyExc_ValueError, "need at least one field");
    return nullptr;
  }
  std::vector<std::string> want;
  want.reserve(static_cast<size_t>(nfields));
  for (Py_ssize_t i = 0; i < nfields; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fields_seq, i);
    Py_ssize_t len;
    const char* s = PyUnicode_AsUTF8AndSize(item, &len);
    if (!s) {
      Py_DECREF(fields_seq);
      return nullptr;
    }
    want.emplace_back(s, static_cast<size_t>(len));
  }
  Py_DECREF(fields_seq);

  std::string data, arena;
  std::vector<int64_t> offs, lens;
  int64_t err = 0;
  bool readable;
  Py_BEGIN_ALLOW_THREADS
  readable = jsonl::read_file(path, data);
  if (readable) {
    arena.reserve(data.size() / 2);
    err = jsonl::extract(data.data(), data.size(), want, arena, offs, lens);
    data.clear();
    data.shrink_to_fit();  // drop the raw file before building objects
  }
  Py_END_ALLOW_THREADS
  if (!readable || err != 0) Py_RETURN_NONE;  // caller falls back

  const size_t nf = static_cast<size_t>(nfields);
  const size_t nrows = offs.size() / nf;
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(nrows));
  if (!out) return nullptr;
  for (size_t i = 0; i < nrows; ++i) {
    PyObject* row = PyTuple_New(nfields);
    if (!row) {
      Py_DECREF(out);
      return nullptr;
    }
    for (size_t j = 0; j < nf; ++j) {
      const int64_t len = lens[i * nf + j];
      PyObject* cell;
      if (len < 0) {
        cell = Py_None;
        Py_INCREF(cell);
      } else {
        cell = PyUnicode_DecodeUTF8(arena.data() + offs[i * nf + j],
                                    static_cast<Py_ssize_t>(len), "strict");
        if (!cell) {  // can't happen for parser-produced UTF-8; be safe
          Py_DECREF(row);
          Py_DECREF(out);
          return nullptr;
        }
      }
      PyTuple_SET_ITEM(row, static_cast<Py_ssize_t>(j), cell);
    }
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i), row);
  }
  return out;
}

static PyMethodDef Methods[] = {
    {"extract_fields", py_extract_fields, METH_VARARGS,
     "extract_fields(path, fields) -> list[tuple[str|None, ...]] | None"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef Module = {
    PyModuleDef_HEAD_INIT, "_jsonl_native",
    "native jsonl field extractor (see native/jsonl_fields.cpp)", -1, Methods,
    nullptr, nullptr, nullptr, nullptr,
};

PyMODINIT_FUNC PyInit__jsonl_native(void) { return PyModule_Create(&Module); }
