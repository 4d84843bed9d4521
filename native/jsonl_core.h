// Parser core for the jsonl field extractor. Shared by the C-ABI wrapper
// (jsonl_fields.cpp, ctypes bridge) and the CPython extension module
// (jsonl_pymod.cpp, the fast path — it materializes the Python strings
// directly). See jsonl_fields.cpp for the correctness contract.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace jsonl {

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  void fail() { ok = false; }
  bool done() const { return p >= end; }
  char peek() const { return *p; }

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  }

  bool expect(char c) {
    if (done() || *p != c) { fail(); return false; }
    ++p;
    return true;
  }

  static void append_utf8(std::string& s, uint32_t cp) {
    if (cp < 0x80) {
      s += static_cast<char>(cp);
    } else if (cp < 0x800) {
      s += static_cast<char>(0xC0 | (cp >> 6));
      s += static_cast<char>(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
      s += static_cast<char>(0xE0 | (cp >> 12));
      s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      s += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      s += static_cast<char>(0xF0 | (cp >> 18));
      s += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
      s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      s += static_cast<char>(0x80 | (cp & 0x3F));
    }
  }

  int hex4(uint32_t& v) {
    if (end - p < 4) return -1;
    v = 0;
    for (int i = 0; i < 4; ++i) {
      char c = p[i];
      v <<= 4;
      if (c >= '0' && c <= '9') v |= c - '0';
      else if (c >= 'a' && c <= 'f') v |= c - 'a' + 10;
      else if (c >= 'A' && c <= 'F') v |= c - 'A' + 10;
      else return -1;
    }
    p += 4;
    return 0;
  }

  // Parse a JSON string (consumes the opening quote). Unescapes into `dst`.
  bool parse_string(std::string& dst) {
    if (!expect('"')) return false;
    while (p < end) {
      char c = *p;
      if (c == '"') { ++p; return true; }
      if (c == '\\') {
        ++p;
        if (done()) { fail(); return false; }
        char e = *p++;
        switch (e) {
          case '"': dst += '"'; break;
          case '\\': dst += '\\'; break;
          case '/': dst += '/'; break;
          case 'b': dst += '\b'; break;
          case 'f': dst += '\f'; break;
          case 'n': dst += '\n'; break;
          case 'r': dst += '\r'; break;
          case 't': dst += '\t'; break;
          case 'u': {
            uint32_t hi;
            if (hex4(hi) != 0) { fail(); return false; }
            if (hi >= 0xD800 && hi <= 0xDBFF) {
              // surrogate pair; a lone surrogate is representable in a
              // Python str but not in UTF-8 -> treat as parse failure so
              // the bridge falls back to json.loads (exact parity)
              if (end - p < 6 || p[0] != '\\' || p[1] != 'u') { fail(); return false; }
              p += 2;
              uint32_t lo;
              if (hex4(lo) != 0 || lo < 0xDC00 || lo > 0xDFFF) { fail(); return false; }
              append_utf8(dst, 0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00));
            } else if (hi >= 0xDC00 && hi <= 0xDFFF) {
              fail(); return false;  // lone low surrogate
            } else {
              append_utf8(dst, hi);
            }
            break;
          }
          default: fail(); return false;
        }
      } else if (static_cast<unsigned char>(c) < 0x20) {
        fail(); return false;  // raw control char: invalid JSON
      } else {
        dst += c;  // UTF-8 bytes pass through verbatim
        ++p;
      }
    }
    fail();
    return false;  // unterminated
  }

  bool skip_string() {
    if (!expect('"')) return false;
    while (p < end) {
      if (*p == '"') { ++p; return true; }
      if (*p == '\\') {
        ++p;
        if (done()) break;
      }
      ++p;
    }
    fail();
    return false;
  }

  // Skip any JSON value (used for unrequested fields and nested structure).
  bool skip_value() {
    skip_ws();
    if (done()) { fail(); return false; }
    char c = *p;
    if (c == '"') return skip_string();
    if (c == '{' || c == '[') {
      char open = c, close = (c == '{') ? '}' : ']';
      int depth = 0;
      while (p < end) {
        c = *p;
        if (c == '"') {
          if (!skip_string()) return false;
          continue;
        }
        if (c == open) ++depth;
        else if (c == close) {
          --depth;
          if (depth == 0) { ++p; return true; }
        }
        ++p;
      }
      fail();
      return false;
    }
    // number / true / false / null: token of non-delimiter chars
    const char* start = p;
    while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != ' ' &&
           *p != '\t' && *p != '\r')
      ++p;
    if (p == start) { fail(); return false; }
    return true;
  }

  // Raw token text for number/bool/null values of requested fields.
  bool parse_token(std::string& dst) {
    const char* start = p;
    while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != ' ' &&
           *p != '\t' && *p != '\r')
      ++p;
    if (p == start) { fail(); return false; }
    dst.append(start, p - start);
    return true;
  }
};

// One-pass extraction over an in-memory jsonl buffer. Appends unescaped cell
// bytes to `arena` and (offset, length) spans per (row, field) to
// `offs`/`lens` (length -1 = missing). Returns 0 on success, else the
// 1-based line number of the first malformed row.
inline int64_t extract(const char* data, size_t size,
                       const std::vector<std::string>& want,
                       std::string& arena,
                       std::vector<int64_t>& offs,
                       std::vector<int64_t>& lens) {
  const size_t nfields = want.size();
  const char* cur = data;
  const char* data_end = data + size;
  int64_t line_no = 0;
  std::string key;

  while (cur < data_end) {
    const char* nl = static_cast<const char*>(
        memchr(cur, '\n', static_cast<size_t>(data_end - cur)));
    const char* line_end = nl ? nl : data_end;
    ++line_no;

    Parser ps{cur, line_end};
    cur = nl ? nl + 1 : data_end;

    ps.skip_ws();
    if (ps.done()) continue;  // blank line

    size_t row_base = offs.size();
    offs.resize(row_base + nfields, 0);
    lens.resize(row_base + nfields, -1);

    if (!ps.expect('{')) return line_no;
    ps.skip_ws();
    if (!ps.done() && ps.peek() == '}') {
      ps.p++;  // empty object: all fields missing
    } else {
      while (true) {
        ps.skip_ws();
        key.clear();
        if (!ps.parse_string(key)) break;
        ps.skip_ws();
        if (!ps.expect(':')) break;
        ps.skip_ws();
        int fi = -1;
        for (size_t i = 0; i < nfields; ++i)
          if (want[i] == key) { fi = static_cast<int>(i); break; }
        if (fi >= 0) {
          // duplicate keys: last wins (overwrite the span; earlier bytes
          // stay in the arena as waste — duplicates are pathological)
          int64_t start = static_cast<int64_t>(arena.size());
          bool got = false;
          if (!ps.done() && ps.peek() == '"') {
            got = ps.parse_string(arena);
          } else if (!ps.done() && (ps.peek() == '{' || ps.peek() == '[')) {
            got = ps.skip_value();  // structured value => missing
            start = -1;
          } else {
            got = ps.parse_token(arena);
            // JSON null -> missing (json.loads gives Python None)
            if (got && static_cast<int64_t>(arena.size()) - start == 4 &&
                arena.compare(static_cast<size_t>(start), 4, "null") == 0) {
              arena.resize(static_cast<size_t>(start));
              start = -1;
            }
          }
          if (!got) break;
          if (start >= 0) {
            offs[row_base + fi] = start;
            lens[row_base + fi] = static_cast<int64_t>(arena.size()) - start;
          } else {
            lens[row_base + fi] = -1;
          }
        } else {
          if (!ps.skip_value()) break;
        }
        ps.skip_ws();
        if (ps.done()) { ps.fail(); break; }
        char c = ps.peek();
        if (c == ',') { ps.p++; continue; }
        if (c == '}') { ps.p++; break; }
        ps.fail();
        break;
      }
    }
    if (ps.ok) {
      ps.skip_ws();
      if (!ps.done()) ps.fail();  // trailing garbage after the object
    }
    if (!ps.ok) return line_no;
  }
  return 0;
}

// Read a whole file; returns false if unreadable.
inline bool read_file(const char* path, std::string& data) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  int64_t fsize = f.tellg();
  f.seekg(0);
  data.resize(static_cast<size_t>(fsize));
  f.read(data.data(), fsize);
  return static_cast<bool>(f);
}

}  // namespace jsonl
