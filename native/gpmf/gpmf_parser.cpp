// Native GoPro GPMF telemetry parser with the reference's C ABI.
//
// Rebuild of the reference's Rust `telemetry-parser-cpp` cdylib
// (ref: rust/telemetry-parser-cpp/src/lib.rs:17-61, ABI
// inc/telemetry-parser.h:7-18): tp_load_gyro(path, orient) extracts the
// gyro stream from a GoPro MP4's `gpmd` metadata track and returns
// malloc'd arrays — timestamps in seconds, angular rates in rad/s —
// freed by tp_free. Orientation string: 3 chars of {x,X,y,Y,z,Z};
// output axis i takes the named source component, lowercase = negated
// (matches rssync_tpu.frontend.telemetry.apply_orientation).
//
// Scope: ISO-BMFF box walk (moov/trak/mdia/minf/stbl: stsd 'gpmd',
// stts, stsc, stsz, stco/co64, mdhd), recursive GPMF KLV parse
// (DEVC -> STRM -> GYRO/SCAL/ORIN/ORIO), SCAL scaling, ORIN/ORIO
// normalization, stts-spread per-sample timestamps; plus CAMM
// (Google camera-motion metadata) tracks, packet type 2 = angular
// velocity. Matches the Python implementation in
// rssync_tpu/frontend/telemetry.py bit-for-bit on the supported paths
// (cross-checked in tests/test_native_gpmf.py).

#include <algorithm>
#include <array>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct tp_gyrodata {
  size_t samples;
  double* timestamps;
  double* gyro;
};

tp_gyrodata tp_load_gyro(const char* path, const char* orient);
void tp_free(tp_gyrodata d);
}

namespace {

struct Span {
  const uint8_t* p;
  size_t len;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}
uint64_t be64(const uint8_t* p) {
  return (uint64_t(be32(p)) << 32) | be32(p + 4);
}
uint16_t be16(const uint8_t* p) { return uint16_t((p[0] << 8) | p[1]); }

struct Box {
  char type[5];
  size_t payload_off;
  size_t payload_end;
};

// Iterate ISO-BMFF boxes in [off, end); returns false when exhausted.
bool next_box(const uint8_t* buf, size_t end, size_t* off, Box* out) {
  if (*off + 8 > end) return false;
  uint64_t size = be32(buf + *off);
  std::memcpy(out->type, buf + *off + 4, 4);
  out->type[4] = 0;
  size_t hdr = 8;
  if (size == 1) {
    if (*off + 16 > end) return false;
    size = be64(buf + *off + 8);
    hdr = 16;
  } else if (size == 0) {
    size = end - *off;
  }
  // `size` is a raw 64-bit file value: compare against the remaining
  // span (end - *off) instead of `*off + size` so a huge size cannot
  // wrap the addition, fake a passing bound, and loop the walk forever
  if (size < hdr || size > end - *off) return false;
  out->payload_off = *off + hdr;
  out->payload_end = *off + size;
  *off += size;
  return true;
}

// Find first descendant box following a path of fourccs.
bool find_box(const uint8_t* buf, size_t start, size_t end,
              const std::vector<const char*>& path, size_t depth, Span* out) {
  size_t off = start;
  Box b;
  while (next_box(buf, end, &off, &b)) {
    if (std::memcmp(b.type, path[depth], 4) == 0) {
      if (depth + 1 == path.size()) {
        out->p = buf + b.payload_off;
        out->len = b.payload_end - b.payload_off;
        return true;
      }
      if (find_box(buf, b.payload_off, b.payload_end, path, depth + 1, out))
        return true;
    }
  }
  return false;
}

struct Stream {
  std::vector<double> scal;
  std::string orin, orio;
  std::vector<double> gyro;  // flattened triples
  size_t n = 0;
};

double read_scalar(const uint8_t* p, uint8_t type) {
  switch (type) {
    case 'b': return double(int8_t(p[0]));
    case 'B': return double(p[0]);
    case 's': return double(int16_t(be16(p)));
    case 'S': return double(be16(p));
    case 'l': return double(int32_t(be32(p)));
    case 'L': return double(be32(p));
    case 'f': { uint32_t u = be32(p); float f; std::memcpy(&f, &u, 4); return f; }
    case 'd': { uint64_t u = be64(p); double f; std::memcpy(&f, &u, 8); return f; }
    case 'j': return double(int64_t(be64(p)));
    case 'J': return double(be64(p));
    default: return 0.0;
  }
}

size_t scalar_width(uint8_t type) {
  switch (type) {
    case 'b': case 'B': return 1;
    case 's': case 'S': return 2;
    case 'l': case 'L': case 'f': return 4;
    case 'd': case 'j': case 'J': return 8;
    default: return 0;
  }
}

// Recursive KLV walk; collects GYRO streams found under this payload.
// depth-capped: adversarial nesting (every 8 bytes one level) would
// otherwise grow the native stack linearly with file size.
constexpr int kMaxKlvDepth = 64;

void parse_klv(const uint8_t* buf, size_t start, size_t end,
               std::vector<Stream>* streams, Stream* cur, int depth = 0) {
  if (depth > kMaxKlvDepth) return;
  size_t off = start;
  while (off + 8 <= end) {
    const uint8_t* k = buf + off;
    uint8_t type = k[4];
    uint8_t ssize = k[5];
    uint16_t repeat = be16(k + 6);
    size_t dlen = size_t(ssize) * repeat;
    size_t dstart = off + 8;
    if (dstart + dlen > end) break;
    if (type == 0) {  // nested
      if (std::memcmp(k, "STRM", 4) == 0) {
        Stream s;
        parse_klv(buf, dstart, dstart + dlen, streams, &s, depth + 1);
        if (s.n > 0) streams->push_back(std::move(s));
      } else {
        parse_klv(buf, dstart, dstart + dlen, streams, cur, depth + 1);
      }
    } else if (cur != nullptr) {
      if (std::memcmp(k, "GYRO", 4) == 0) {
        size_t w = scalar_width(type);
        if (w > 0 && ssize == 3 * w) {
          cur->n = repeat;
          cur->gyro.resize(size_t(repeat) * 3);
          for (size_t r = 0; r < repeat; ++r)
            for (size_t c = 0; c < 3; ++c)
              cur->gyro[r * 3 + c] =
                  read_scalar(buf + dstart + r * ssize + c * w, type);
        }
      } else if (std::memcmp(k, "SCAL", 4) == 0) {
        size_t w = scalar_width(type);
        if (w > 0) {
          size_t per = ssize / w;
          cur->scal.clear();
          for (size_t r = 0; r < repeat; ++r)
            for (size_t c = 0; c < per; ++c)
              cur->scal.push_back(
                  read_scalar(buf + dstart + r * ssize + c * w, type));
        }
      } else if (std::memcmp(k, "ORIN", 4) == 0 && type == 'c') {
        cur->orin.assign(reinterpret_cast<const char*>(buf + dstart),
                         size_t(ssize) * repeat);
      } else if (std::memcmp(k, "ORIO", 4) == 0 && type == 'c') {
        cur->orio.assign(reinterpret_cast<const char*>(buf + dstart),
                         size_t(ssize) * repeat);
      }
    }
    off = dstart + ((dlen + 3) & ~size_t(3));
  }
}

// ORIN/ORIO normalization (GoPro orientation remap): output axis j
// (letter ORIO[j], default "XYZ") takes the ORIN position with the
// matching letter; negate when cases differ.
void orin_remap(std::vector<double>& g, size_t n, const std::string& orin,
                const std::string& orio_in) {
  if (orin.size() != 3) return;
  std::string orio = orio_in.size() == 3 ? orio_in : "XYZ";
  int src[3];
  double sign[3];
  for (int j = 0; j < 3; ++j) {
    src[j] = -1;
    for (int i = 0; i < 3; ++i) {
      if (std::tolower(orin[i]) == std::tolower(orio[j])) {
        src[j] = i;
        sign[j] = (std::isupper(orin[i]) == std::isupper(orio[j])) ? 1.0 : -1.0;
        break;
      }
    }
    if (src[j] < 0) return;  // malformed: leave as-is
  }
  for (size_t r = 0; r < n; ++r) {
    double in[3] = {g[r * 3], g[r * 3 + 1], g[r * 3 + 2]};
    for (int j = 0; j < 3; ++j) g[r * 3 + j] = sign[j] * in[src[j]];
  }
}

bool user_orient(std::vector<double>& g, size_t n, const char* orient) {
  if (orient == nullptr || orient[0] == 0) return true;
  if (std::strlen(orient) != 3) return false;
  int src[3];
  double sign[3];
  for (int j = 0; j < 3; ++j) {
    char c = std::tolower(orient[j]);
    if (c < 'x' || c > 'z') return false;
    src[j] = c - 'x';
    sign[j] = std::isupper(orient[j]) ? 1.0 : -1.0;
  }
  for (size_t r = 0; r < n; ++r) {
    double in[3] = {g[r * 3], g[r * 3 + 1], g[r * 3 + 2]};
    for (int j = 0; j < 3; ++j) g[r * 3 + j] = sign[j] * in[src[j]];
  }
  return true;
}

tp_gyrodata empty() { return tp_gyrodata{0, nullptr, nullptr}; }

// --- GyroFlow JSON telemetry ------------------------------------------------
// Minimal recursive-descent JSON scanner for gyro-data JSON files:
// either a top-level array of samples or an object with a "raw_imu"
// array; each sample an object with "ts" (milliseconds) and "gyro"
// [x, y, z] in deg/s (GyroFlow's raw_imu convention). Output converts
// to seconds / rad/s like every other path (ABI parity with the Rust
// wrapper's normalization, ref lib.rs:50-56). No dependency, strictly
// bounded by [p, end); malformed input -> fail flag -> empty result.

struct JsonScan {
  const char* p;
  const char* end;
  bool fail = false;
  int depth = 0;  // recursion guard for skip_value ([[[... bombs)

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool lit(const char* s) {
    size_t l = std::strlen(s);
    if (size_t(end - p) < l || std::memcmp(p, s, l) != 0) return false;
    p += l;
    return true;
  }
  double number() {
    char buf[64];
    size_t i = 0;
    while (p < end && i < sizeof(buf) - 1 &&
           (std::isdigit((unsigned char)*p) || *p == '-' || *p == '+' ||
            *p == '.' || *p == 'e' || *p == 'E'))
      buf[i++] = *p++;
    if (i == 0) { fail = true; return 0.0; }
    buf[i] = 0;
    return std::atof(buf);
  }
  // skip a string (handles escapes); returns its raw contents span
  bool string_span(const char** s, size_t* l) {
    if (p >= end || *p != '"') { fail = true; return false; }
    ++p;
    *s = p;
    while (p < end && *p != '"') {
      if (*p == '\\') ++p;
      if (p < end) ++p;
    }
    if (p >= end) { fail = true; return false; }
    *l = size_t(p - *s);
    ++p;  // closing quote
    return true;
  }
  void skip_value() {
    ws();
    if (fail || p >= end || ++depth > 64) { fail = true; return; }
    struct Dec { int* d; ~Dec() { --*d; } } dec{&depth};
    if (*p == '"') {
      const char* s; size_t l;
      string_span(&s, &l);
    } else if (*p == '{') {
      ++p;
      ws();
      if (p < end && *p == '}') { ++p; return; }
      while (p < end && !fail) {
        ws();
        const char* s; size_t l;
        if (!string_span(&s, &l)) return;
        ws();
        if (p >= end || *p != ':') { fail = true; return; }
        ++p;
        skip_value();
        ws();
        if (p < end && *p == ',') { ++p; continue; }
        break;
      }
      ws();
      if (p < end && *p == '}') ++p; else fail = true;
    } else if (*p == '[') {
      ++p;
      ws();
      if (p < end && *p == ']') { ++p; return; }
      while (p < end && !fail) {
        skip_value();
        ws();
        if (p < end && *p == ',') { ++p; continue; }
        break;
      }
      ws();
      if (p < end && *p == ']') ++p; else fail = true;
    } else if (lit("true") || lit("false") || lit("null")) {
    } else {
      number();
    }
  }
};

// parse one sample object {"ts": ms, "gyro": [x,y,z], ...}
bool json_sample(JsonScan& js, double* ts, double g[3], bool* have_ts,
                 bool* have_gyro) {
  *have_ts = *have_gyro = false;
  js.ws();
  if (js.p >= js.end || *js.p != '{') { js.fail = true; return false; }
  ++js.p;
  js.ws();
  if (js.p < js.end && *js.p == '}') { ++js.p; return true; }
  while (js.p < js.end && !js.fail) {
    js.ws();
    const char* s; size_t l;
    if (!js.string_span(&s, &l)) return false;
    js.ws();
    if (js.p >= js.end || *js.p != ':') { js.fail = true; return false; }
    ++js.p;
    js.ws();
    if (l == 2 && std::memcmp(s, "ts", 2) == 0) {
      *ts = js.number();
      *have_ts = !js.fail;
    } else if (l == 4 && std::memcmp(s, "gyro", 4) == 0) {
      if (js.p >= js.end || *js.p != '[') { js.fail = true; return false; }
      ++js.p;
      for (int c = 0; c < 3; ++c) {
        js.ws();
        g[c] = js.number();
        js.ws();
        if (c < 2) {
          if (js.p >= js.end || *js.p != ',') { js.fail = true; return false; }
          ++js.p;
        }
      }
      js.ws();
      if (js.p >= js.end || *js.p != ']') { js.fail = true; return false; }
      ++js.p;
      *have_gyro = true;
    } else {
      js.skip_value();
    }
    js.ws();
    if (js.p < js.end && *js.p == ',') { ++js.p; continue; }
    break;
  }
  js.ws();
  if (js.p < js.end && *js.p == '}') { ++js.p; return !js.fail; }
  js.fail = true;
  return false;
}

bool json_sample_array(JsonScan& js, std::vector<double>* ts,
                       std::vector<double>* gyro) {
  js.ws();
  if (js.p >= js.end || *js.p != '[') { js.fail = true; return false; }
  ++js.p;
  js.ws();
  if (js.p < js.end && *js.p == ']') { ++js.p; return true; }
  while (js.p < js.end && !js.fail) {
    double t = 0.0, g[3] = {0, 0, 0};
    bool ht, hg;
    if (!json_sample(js, &t, g, &ht, &hg)) return false;
    if (ht && hg) {
      ts->push_back(t * 1e-3);  // ms -> s
      for (int c = 0; c < 3; ++c)
        gyro->push_back(g[c] * 0.017453292519943295);  // deg/s -> rad/s
    }
    js.ws();
    if (js.p < js.end && *js.p == ',') { ++js.p; continue; }
    break;
  }
  js.ws();
  if (js.p < js.end && *js.p == ']') { ++js.p; return !js.fail; }
  js.fail = true;
  return false;
}

bool parse_gyroflow_json(const uint8_t* buf, size_t len,
                         std::vector<double>* ts, std::vector<double>* gyro) {
  JsonScan js{reinterpret_cast<const char*>(buf),
              reinterpret_cast<const char*>(buf) + len};
  js.ws();
  if (js.p >= js.end) return false;
  if (*js.p == '[') return json_sample_array(js, ts, gyro) && !js.fail;
  if (*js.p != '{') return false;
  ++js.p;
  js.ws();
  if (js.p < js.end && *js.p == '}') return false;
  while (js.p < js.end && !js.fail) {
    js.ws();
    const char* s; size_t l;
    if (!js.string_span(&s, &l)) return false;
    js.ws();
    if (js.p >= js.end || *js.p != ':') return false;
    ++js.p;
    js.ws();
    if (l == 7 && std::memcmp(s, "raw_imu", 7) == 0) {
      return json_sample_array(js, ts, gyro) && !js.fail;
    }
    js.skip_value();
    js.ws();
    if (js.p < js.end && *js.p == ',') { ++js.p; continue; }
    break;
  }
  return false;
}

// --- text telemetry formats --------------------------------------------
// gcsv / plain CSV / Betaflight blackbox CSV / binary blackbox (.bbl),
// each mirroring the corresponding parser in
// rssync_tpu/frontend/telemetry.py bit for bit on well-formed inputs
// (strtod and Python float() are both correctly-rounded IEEE-754).
// Replaces the breadth the reference inherits from the telemetry-parser
// crate's single native entry point
// (ref: rust/telemetry-parser-cpp/src/lib.rs:29-37).

constexpr double kDeg2Rad = 0.017453292519943295;

// full-token strtod: the whole trimmed field must parse (Python float())
bool parse_f64(const char* s, const char* e, double* out) {
  while (s < e && std::isspace((unsigned char)*s)) ++s;
  while (e > s && std::isspace((unsigned char)e[-1])) --e;
  if (s >= e || size_t(e - s) > 63) return false;
  char tmp[64];
  std::memcpy(tmp, s, size_t(e - s));
  tmp[e - s] = 0;
  // Python float() rejects C99 hex-float literals that strtod accepts
  if (tmp[0] == '0' && (tmp[1] == 'x' || tmp[1] == 'X')) return false;
  if ((tmp[0] == '-' || tmp[0] == '+') && tmp[1] == '0' &&
      (tmp[2] == 'x' || tmp[2] == 'X'))
    return false;
  char* endp = nullptr;
  double v = std::strtod(tmp, &endp);
  if (endp != tmp + (e - s)) return false;
  *out = v;
  return true;
}

struct Lines {
  const char* p;
  const char* end;
  // next line [s, e) without the newline; false at EOF
  bool next(const char** s, const char** e) {
    if (p >= end) return false;
    *s = p;
    const char* nl = static_cast<const char*>(
        std::memchr(p, '\n', size_t(end - p)));
    if (nl == nullptr) {
      *e = end;
      p = end;
    } else {
      *e = nl;
      p = nl + 1;
    }
    if (*e > *s && (*e)[-1] == '\r') --*e;
    return true;
  }
};

void split_fields(const char* s, const char* e,
                  std::vector<std::pair<const char*, const char*>>* out) {
  out->clear();
  const char* f = s;
  for (const char* q = s;; ++q) {
    if (q == e || *q == ',') {
      out->push_back({f, q});
      if (q == e) break;
      f = q + 1;
    }
  }
}

bool field_is(const std::pair<const char*, const char*>& f, const char* k) {
  const char* s = f.first;
  const char* e = f.second;
  size_t l = std::strlen(k);
  if (size_t(e - s) != l) return false;
  for (size_t i = 0; i < l; ++i)
    if (std::tolower((unsigned char)s[i]) != k[i]) return false;
  return true;
}

// GyroFlow .gcsv: `key,value` header lines (tscale/gscale/...), then
// `t,gx,gy,gz[,...]` rows (mirrors telemetry.py::parse_gcsv)
bool parse_gcsv_text(const uint8_t* buf, size_t len, std::vector<double>* ts,
                     std::vector<double>* gy) {
  static const char* kSkip[] = {
      "ascale", "mscale", "version", "id", "orientation", "videofilename",
      "lensprofile", "lens_profile", "vendor", "frequency", "note",
      "t", "time"};
  double tscale = 1.0, gscale = 1.0;
  Lines ln{reinterpret_cast<const char*>(buf),
           reinterpret_cast<const char*>(buf) + len};
  std::vector<std::pair<const char*, const char*>> f;
  const char *s, *e;
  while (ln.next(&s, &e)) {
    while (s < e && std::isspace((unsigned char)*s)) ++s;
    while (e > s && std::isspace((unsigned char)e[-1])) --e;
    if (s >= e) continue;
    split_fields(s, e, &f);
    if (field_is(f[0], "tscale") && f.size() > 1) {
      parse_f64(f[1].first, f[1].second, &tscale);
      continue;
    }
    if (field_is(f[0], "gscale") && f.size() > 1) {
      parse_f64(f[1].first, f[1].second, &gscale);
      continue;
    }
    bool skip = false;
    for (const char* k : kSkip)
      if (field_is(f[0], k)) {
        skip = true;
        break;
      }
    if (skip) continue;
    if (f.size() < 4) continue;
    double row[4];
    bool ok = true;
    for (int i = 0; i < 4 && ok; ++i)
      ok = parse_f64(f[i].first, f[i].second, &row[i]);
    if (!ok) continue;
    ts->push_back(row[0] * tscale);
    for (int i = 1; i < 4; ++i) gy->push_back(row[i] * gscale);
  }
  return !ts->empty();
}

// plain CSV `t_seconds,gx,gy,gz` with optional header line (mirrors
// telemetry.py::parse_csv / np.genfromtxt: unparseable fields -> NaN,
// '#' comments stripped, first row dropped if any of its fields is NaN)
bool parse_plain_csv(const uint8_t* buf, size_t len, std::vector<double>* ts,
                     std::vector<double>* gy) {
  Lines ln{reinterpret_cast<const char*>(buf),
           reinterpret_cast<const char*>(buf) + len};
  std::vector<std::pair<const char*, const char*>> f;
  std::vector<std::array<double, 4>> rows;
  const char *s, *e;
  size_t ncols = 0;
  bool first = true, first_nan = false;
  while (ln.next(&s, &e)) {
    // e >= s by Lines::next; the explicit guard keeps the compiler's
    // range analysis (and readers) certain the bound can't wrap
    if (e > s) {
      const char* hash =
          static_cast<const char*>(std::memchr(s, '#', size_t(e - s)));
      if (hash != nullptr) e = hash;
    }
    while (s < e && std::isspace((unsigned char)*s)) ++s;
    while (e > s && std::isspace((unsigned char)e[-1])) --e;
    if (s >= e) continue;
    split_fields(s, e, &f);
    if (ncols == 0) ncols = f.size();
    if (f.size() != ncols) return false;  // genfromtxt raises
    std::array<double, 4> row{};
    bool any_nan = false;
    size_t take = f.size() < 4 ? f.size() : 4;
    for (size_t i = 0; i < take; ++i) {
      if (!parse_f64(f[i].first, f[i].second, &row[i])) {
        row[i] = std::nan("");
        any_nan = true;
      }
    }
    if (first) {
      first = false;
      first_nan = any_nan;
    }
    rows.push_back(row);
  }
  if (ncols < 4 || rows.empty()) return false;
  size_t start = first_nan ? 1 : 0;
  if (rows.size() <= start) return false;
  for (size_t r = start; r < rows.size(); ++r) {
    ts->push_back(rows[r][0]);
    for (int c = 1; c < 4; ++c) gy->push_back(rows[r][c]);
  }
  return true;
}

// field name with surrounding whitespace and quotes stripped
bool header_is(const std::pair<const char*, const char*>& f, const char* k) {
  const char* s = f.first;
  const char* e = f.second;
  while (s < e && std::isspace((unsigned char)*s)) ++s;
  while (e > s && std::isspace((unsigned char)e[-1])) --e;
  if (s < e && *s == '"') ++s;
  if (e > s && e[-1] == '"') --e;
  return size_t(e - s) == std::strlen(k) && std::memcmp(s, k, e - s) == 0;
}

// blackbox_decode --csv output: header row with time (us) and
// gyroADC[0..2] (deg/s) (mirrors telemetry.py::parse_blackbox_csv)
bool parse_blackbox_csv(const uint8_t* buf, size_t len,
                        std::vector<double>* ts, std::vector<double>* gy) {
  Lines ln{reinterpret_cast<const char*>(buf),
           reinterpret_cast<const char*>(buf) + len};
  std::vector<std::pair<const char*, const char*>> f;
  const char *s, *e;
  int it = -1, ig[3] = {-1, -1, -1};
  while (ln.next(&s, &e)) {
    if (std::search(s, e, "gyroADC[0]", "gyroADC[0]" + 10) == e) continue;
    split_fields(s, e, &f);
    for (size_t i = 0; i < f.size(); ++i) {
      if (it < 0 && header_is(f[i], "time")) it = int(i);
      for (int c = 0; c < 3; ++c) {
        char name[16];
        std::snprintf(name, sizeof name, "gyroADC[%d]", c);
        if (ig[c] < 0 && header_is(f[i], name)) ig[c] = int(i);
      }
    }
    break;
  }
  if (it < 0 || ig[0] < 0 || ig[1] < 0 || ig[2] < 0) return false;
  size_t need =
      size_t(std::max(std::max(it, ig[0]), std::max(ig[1], ig[2]))) + 1;
  while (ln.next(&s, &e)) {
    split_fields(s, e, &f);
    if (f.size() < need) continue;
    double t, g[3];
    if (!parse_f64(f[size_t(it)].first, f[size_t(it)].second, &t)) continue;
    bool ok = true;
    for (int c = 0; c < 3 && ok; ++c)
      ok = parse_f64(f[size_t(ig[c])].first, f[size_t(ig[c])].second, &g[c]);
    if (!ok) continue;
    ts->push_back(t * 1e-6);
    for (int c = 0; c < 3; ++c) gy->push_back(g[c] * kDeg2Rad);
  }
  return !ts->empty();
}

// --- binary Betaflight blackbox (.bbl) ----------------------------------
// Blackbox data format v2 subset, mirroring
// telemetry.py::parse_blackbox_bbl (see its docstring for the exact
// scope, unit conventions, and the fixture-only validation caveat).

struct BblStream {
  const uint8_t* buf;
  size_t pos, end;
  bool fail = false;

  bool eof() const { return pos >= end; }
  uint8_t byte() {
    if (pos >= end) {
      fail = true;
      return 0;
    }
    return buf[pos++];
  }
  int64_t uvb() {
    int64_t v = 0;
    int shift = 0;
    for (;;) {
      uint8_t b = byte();
      if (fail) return 0;
      v |= int64_t(b & 0x7F) << shift;
      if ((b & 0x80) == 0) return v;
      shift += 7;
      if (shift > 42) {
        fail = true;
        return 0;
      }
    }
  }
  int64_t svb() {
    int64_t v = uvb();
    return (v >> 1) ^ -(v & 1);  // zigzag
  }
};

int64_t sx(int64_t v, int bits) {
  int64_t m = int64_t(1) << (bits - 1);
  return (v ^ m) - m;
}

struct BblTable {
  std::vector<std::string> name;
  std::vector<int> predictor, encoding;
};

double bbl_float(const char* s, const char* e) {
  while (s < e && std::isspace((unsigned char)*s)) ++s;
  if (e - s > 2 && s[0] == '0' && (s[1] == 'x' || s[1] == 'X')) {
    char tmp[32];
    size_t l = size_t(e - s) < 31 ? size_t(e - s) : 31;
    std::memcpy(tmp, s, l);
    tmp[l] = 0;
    uint32_t bits = uint32_t(std::strtoul(tmp, nullptr, 16));
    float f;
    std::memcpy(&f, &bits, 4);
    return double(f);
  }
  double v = 0.0;
  parse_f64(s, e, &v);
  return v;
}

// decode one frame's raw (pre-predictor) values; false on stream fail
bool bbl_decode_fields(BblStream& st, const std::vector<int>& enc,
                       std::vector<int64_t>* vals) {
  size_t nf = enc.size();
  vals->assign(nf, 0);
  size_t i = 0;
  while (i < nf) {
    int e = enc[i];
    if (e == 0) {
      (*vals)[i++] = st.svb();
    } else if (e == 1) {
      (*vals)[i++] = st.uvb();
    } else if (e == 3) {
      (*vals)[i++] = -sx(st.uvb() & 0x3FFF, 14);
    } else if (e == 6) {  // TAG8_8SVB over the run of same-encoded fields
      size_t j = i;
      while (j < nf && enc[j] == 6 && j - i < 8) ++j;
      size_t cnt = j - i;
      if (cnt == 1) {
        (*vals)[i] = st.svb();
      } else {
        uint8_t hdr = st.byte();
        for (size_t k = 0; k < cnt; ++k)
          (*vals)[i + k] = ((hdr >> k) & 1) ? st.svb() : 0;
      }
      i = j;
    } else if (e == 7) {  // TAG2_3S32: groups of 3
      uint8_t lead = st.byte();
      int tag = lead >> 6;
      int64_t g[3] = {0, 0, 0};
      if (tag == 0) {
        g[0] = sx((lead >> 4) & 3, 2);
        g[1] = sx((lead >> 2) & 3, 2);
        g[2] = sx(lead & 3, 2);
      } else if (tag == 1) {
        uint8_t b = st.byte();
        g[0] = sx(lead & 0xF, 4);
        g[1] = sx(b >> 4, 4);
        g[2] = sx(b & 0xF, 4);
      } else if (tag == 2) {
        g[0] = sx(lead & 0x3F, 6);
        g[1] = sx(st.byte() & 0x3F, 6);
        g[2] = sx(st.byte() & 0x3F, 6);
      } else {
        for (int k = 0; k < 3; ++k) {
          int sel = (lead >> (2 * k)) & 3;
          int nb = sel + 1;  // 1/2/3/4 bytes, little-endian
          int64_t raw = 0;
          for (int bi = 0; bi < nb; ++bi)
            raw |= int64_t(st.byte()) << (8 * bi);
          g[k] = sx(raw, 8 * nb);
        }
      }
      for (int k = 0; k < 3; ++k)
        if (i + size_t(k) < nf) (*vals)[i + size_t(k)] = g[k];
      i += 3;
    } else if (e == 8) {  // TAG8_4S16 v2: groups of 4, nibble-packed
      uint8_t sel = st.byte();
      int have_nib = 0;
      uint8_t nib_val = 0;
      auto nibble = [&]() -> int64_t {
        if (!have_nib) {
          uint8_t b = st.byte();
          nib_val = b & 0xF;
          have_nib = 1;
          return b >> 4;
        }
        have_nib = 0;
        return nib_val;
      };
      int64_t g4[4] = {0, 0, 0, 0};
      for (int k = 0; k < 4; ++k) {
        int f = (sel >> (2 * k)) & 3;
        if (f == 1) {
          g4[k] = sx(nibble(), 4);
        } else if (f == 2) {
          g4[k] = sx((nibble() << 4) | nibble(), 8);
        } else if (f == 3) {
          int64_t hi = (nibble() << 4) | nibble();
          int64_t lo = (nibble() << 4) | nibble();
          g4[k] = sx((hi << 8) | lo, 16);
        }
      }
      for (int k = 0; k < 4; ++k)
        if (i + size_t(k) < nf) (*vals)[i + size_t(k)] = g4[k];
      i += 4;
    } else if (e == 9) {
      (*vals)[i++] = 0;
    } else {
      return false;  // unsupported encoding
    }
    if (st.fail) return false;
  }
  return true;
}

bool parse_blackbox_bbl(const uint8_t* buf, size_t len,
                        std::vector<double>* ts, std::vector<double>* gy) {
  // header lines `H name:value`
  BblTable tI, tP, tS;
  bool have_scale = false;
  double scale = 0.0;
  size_t pos = 0;
  while (pos + 2 <= len && buf[pos] == 'H' && buf[pos + 1] == ' ') {
    const char* s = reinterpret_cast<const char*>(buf + pos + 2);
    size_t rem = len - pos - 2;
    const char* nl = static_cast<const char*>(std::memchr(s, '\n', rem));
    const char* e = nl ? nl : s + rem;
    pos = size_t(reinterpret_cast<const uint8_t*>(e) - buf) + (nl ? 1 : 0);
    const char* le = e;
    if (le > s && le[-1] == '\r') --le;
    const char* colon =
        static_cast<const char*>(std::memchr(s, ':', size_t(le - s)));
    if (colon == nullptr) continue;
    std::string name(s, colon);
    const char* vs = colon + 1;
    // trim name
    while (!name.empty() && std::isspace((unsigned char)name.back()))
      name.pop_back();
    if (name.rfind("Field ", 0) == 0 && name.size() >= 9) {
      char fc = name[6];
      std::string what = name.substr(8);
      BblTable* t = fc == 'I' ? &tI : fc == 'P' ? &tP : fc == 'S' ? &tS
                                                                  : nullptr;
      if (t == nullptr || name[7] != ' ') continue;
      std::vector<std::pair<const char*, const char*>> f;
      split_fields(vs, le, &f);
      if (what == "name") {
        for (auto& fd : f) {
          const char* a = fd.first;
          const char* b = fd.second;
          while (a < b && std::isspace((unsigned char)*a)) ++a;
          while (b > a && std::isspace((unsigned char)b[-1])) --b;
          t->name.emplace_back(a, b);
        }
      } else if (what == "predictor" || what == "encoding") {
        std::vector<int>* v =
            what == "predictor" ? &t->predictor : &t->encoding;
        for (auto& fd : f) {
          double d = 0.0;
          parse_f64(fd.first, fd.second, &d);
          v->push_back(int(d));
        }
      }
    } else if (name == "gyro_scale" || name == "gyro.scale") {
      scale = bbl_float(vs, le);
      have_scale = true;
    }
  }
  if (tI.name.empty()) return false;
  size_t nf = tI.name.size();
  if (tP.name.empty()) tP.name = tI.name;
  int i_time = -1, i_gyro[3] = {-1, -1, -1};
  for (size_t i = 0; i < nf; ++i) {
    if (tI.name[i] == "time") i_time = int(i);
    for (int c = 0; c < 3; ++c) {
      char nm[16];
      std::snprintf(nm, sizeof nm, "gyroADC[%d]", c);
      if (tI.name[i] == nm) i_gyro[c] = int(i);
    }
  }
  if (i_time < 0 || i_gyro[0] < 0 || i_gyro[1] < 0 || i_gyro[2] < 0)
    return false;

  auto pad = [nf](std::vector<int> v, int fill) {
    v.resize(nf, fill);
    return v;
  };
  std::vector<int> ip = pad(tI.predictor, 0), ie = pad(tI.encoding, 1);
  std::vector<int> pp = pad(tP.predictor, 0), pe = pad(tP.encoding, 0);
  size_t ns = tS.name.size();
  std::vector<int> se = tS.encoding;
  se.resize(ns, 0);

  BblStream st{buf, pos, len};
  std::vector<int64_t> prev, prev2, raw, cur;
  bool have_prev = false;
  std::vector<std::array<int64_t, 4>> rows;

  while (!st.eof()) {
    char fc = char(st.byte());
    if (st.fail) break;
    if (fc == 'I') {
      if (!bbl_decode_fields(st, ie, &raw)) break;
      // I-frames are self-contained: predictors that reference header
      // constants only affect fields we never read
      prev2 = prev = raw;
      have_prev = true;
    } else if (fc == 'P') {
      if (!have_prev) break;  // P before any I: unsynced stream
      if (!bbl_decode_fields(st, pe, &raw)) break;
      cur.assign(nf, 0);
      for (size_t i = 0; i < nf; ++i) {
        int p = pp[i];
        int64_t base;
        if (p == 0)
          base = 0;
        else if (p == 1)
          base = prev[i];
        else if (p == 2)
          base = 2 * prev[i] - prev2[i];
        else if (p == 3)
          base = (prev[i] + prev2[i]) >> 1;  // floor div, matches Python //
        else if (p == 6)
          base = prev[i] + 1;
        else
          base = prev[i];  // outside the subset: stream position exact
        cur[i] = base + raw[i];
      }
      prev2 = prev;
      prev = cur;
    } else if (fc == 'S' && ns > 0) {
      if (!bbl_decode_fields(st, se, &raw)) break;
      continue;
    } else if (fc == 'E') {
      uint8_t ev = st.byte();
      if (st.fail || ev == 255) break;  // end of log
      if (ev == 0) {
        st.uvb();  // sync beep time
        if (st.fail) break;
        continue;
      }
      if (ev == 30) {
        st.uvb();
        st.uvb();  // logging resume: iteration, time
        if (st.fail) break;
        continue;
      }
      break;  // unknown event: stop at last good frame
    } else {
      break;  // unknown frame type / desync
    }
    rows.push_back({prev[size_t(i_time)], prev[size_t(i_gyro[0])],
                    prev[size_t(i_gyro[1])], prev[size_t(i_gyro[2])]});
  }
  if (rows.empty()) return false;
  for (auto& r : rows) {
    ts->push_back(double(r[0]) * 1e-6);
    for (int c = 0; c < 3; ++c) {
      double v = double(r[1 + c]);
      gy->push_back(have_scale ? v * scale * 1e6
                               : (v / 16.4) * kDeg2Rad);
    }
  }
  return true;
}

bool has_ext(const char* path, const char* ext) {
  size_t lp = std::strlen(path), le = std::strlen(ext);
  if (lp < le) return false;
  for (size_t i = 0; i < le; ++i)
    if (std::tolower((unsigned char)path[lp - le + i]) != ext[i]) return false;
  return true;
}

tp_gyrodata pack_result(const std::vector<double>& ts,
                        const std::vector<double>& gy, const char* orient) {
  tp_gyrodata result{0, nullptr, nullptr};
  if (ts.empty()) return result;
  std::vector<double> g = gy;
  if (!user_orient(g, ts.size(), orient)) return result;
  size_t n = ts.size();
  result.samples = n;
  result.timestamps = static_cast<double*>(malloc(n * sizeof(double)));
  result.gyro = static_cast<double*>(malloc(n * 3 * sizeof(double)));
  std::memcpy(result.timestamps, ts.data(), n * sizeof(double));
  std::memcpy(result.gyro, g.data(), n * 3 * sizeof(double));
  return result;
}

}  // namespace

extern "C" tp_gyrodata tp_load_gyro(const char* path, const char* orient) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return empty();
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    ::close(fd);
    return empty();
  }
  size_t len = size_t(st.st_size);
  void* map = mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return empty();
  const uint8_t* buf = static_cast<const uint8_t*>(map);

  tp_gyrodata result = empty();

  // format dispatch mirroring telemetry.py::load_gyro: extension
  // first, then content sniff (MP4 box header, blackbox magic, JSON
  // brace, gcsv fallback)
  enum class Fmt { kMp4, kJson, kGcsv, kBbl, kCsvAny };
  Fmt fmt;
  if (has_ext(path, ".gcsv")) {
    fmt = Fmt::kGcsv;
  } else if (has_ext(path, ".json") || has_ext(path, ".gyroflow")) {
    fmt = Fmt::kJson;
  } else if (has_ext(path, ".mp4") || has_ext(path, ".mov") ||
             has_ext(path, ".360")) {
    fmt = Fmt::kMp4;
  } else if (has_ext(path, ".bbl") || has_ext(path, ".bfl")) {
    fmt = Fmt::kBbl;
  } else if (has_ext(path, ".csv")) {
    fmt = Fmt::kCsvAny;
  } else if (len >= 8 && (std::memcmp(buf + 4, "ftyp", 4) == 0 ||
                          std::memcmp(buf + 4, "moov", 4) == 0 ||
                          std::memcmp(buf + 4, "mdat", 4) == 0)) {
    fmt = Fmt::kMp4;
  } else if (len >= 18 &&
             std::memcmp(buf, "H Product:Blackbox", 18) == 0) {
    fmt = Fmt::kBbl;
  } else {
    size_t i = 0;
    while (i < len && std::isspace(buf[i])) ++i;
    fmt = (i < len && (buf[i] == '{' || buf[i] == '['))
              ? Fmt::kJson
              : Fmt::kGcsv;
  }

  if (fmt != Fmt::kMp4) {
    std::vector<double> ts, gy;
    switch (fmt) {
      case Fmt::kJson: {
        size_t i = 0;
        while (i < len && std::isspace(buf[i])) ++i;
        if (i < len) parse_gyroflow_json(buf + i, len - i, &ts, &gy);
        break;
      }
      case Fmt::kGcsv:
        parse_gcsv_text(buf, len, &ts, &gy);
        break;
      case Fmt::kBbl:
        parse_blackbox_bbl(buf, len, &ts, &gy);
        break;
      case Fmt::kCsvAny: {
        // blackbox_decode CSVs self-identify via gyroADC columns in
        // the first 4096 bytes (mirrors load_gyro's sniff)
        size_t head = len < 4096 ? len : 4096;
        const char* h = reinterpret_cast<const char*>(buf);
        bool bb = std::search(h, h + head, "gyroADC[0]",
                              "gyroADC[0]" + 10) != h + head;
        if (bb)
          parse_blackbox_csv(buf, len, &ts, &gy);
        else
          parse_plain_csv(buf, len, &ts, &gy);
        break;
      }
      default:
        break;
    }
    result = pack_result(ts, gy, orient);
    munmap(map, len);
    return result;
  }

  do {
    // locate the gpmd trak: any trak whose stsd mentions 'gpmd'
    size_t off = 0;
    Box moov{};
    bool have_moov = false;
    {
      Box b;
      while (next_box(buf, len, &off, &b)) {
        if (std::memcmp(b.type, "moov", 4) == 0) {
          moov = b;
          have_moov = true;
          break;
        }
      }
    }
    if (!have_moov) break;

    Span stbl{}, mdhd{};
    bool found = false;
    bool is_camm = false;
    // prefer the GoPro 'gpmd' track; fall back to a CAMM
    // (camera-motion metadata) track — Insta360/Pixel-class cameras
    for (int pass = 0; pass < 2 && !found; ++pass) {
      const char* want = pass == 0 ? "gpmd" : "camm";
      size_t toff = moov.payload_off;
      Box trak;
      while (next_box(buf, moov.payload_end, &toff, &trak)) {
        if (std::memcmp(trak.type, "trak", 4) != 0) continue;
        Span stsd;
        if (!find_box(buf, trak.payload_off, trak.payload_end,
                      {"mdia", "minf", "stbl", "stsd"}, 0, &stsd))
          continue;
        bool match = false;
        for (size_t i = 0; i + 4 <= stsd.len; ++i)
          if (std::memcmp(stsd.p + i, want, 4) == 0) {
            match = true;
            break;
          }
        if (!match) continue;
        if (!find_box(buf, trak.payload_off, trak.payload_end,
                      {"mdia", "minf", "stbl"}, 0, &stbl))
          continue;
        if (!find_box(buf, trak.payload_off, trak.payload_end,
                      {"mdia", "mdhd"}, 0, &mdhd))
          continue;
        found = true;
        is_camm = pass == 1;
        break;
      }
    }
    if (!found) break;

    if (mdhd.len < 16) break;
    uint8_t version = mdhd.p[0];
    if (version == 1 && mdhd.len < 24) break;
    uint32_t timescale = be32(mdhd.p + (version == 1 ? 20 : 12));
    if (timescale == 0) break;

    const size_t stbl_off = size_t(stbl.p - buf);
    auto sub = [&](const char* name, Span* out) {
      return find_box(buf, stbl_off, stbl_off + stbl.len, {name}, 0, out);
    };
    Span stsz, stco, stsc, stts;
    bool co64 = false;
    if (!sub("stsz", &stsz) || !sub("stsc", &stsc) || !sub("stts", &stts))
      break;
    if (!sub("stco", &stco)) {
      if (!sub("co64", &stco)) break;
      co64 = true;
    }

    // All table counts come from untrusted file bytes: clamp each one to
    // what its box payload can actually hold before sizing any vector,
    // so a malformed count can neither balloon an allocation nor walk
    // reads past the mmap.
    if (stsz.len < 12 || stco.len < 8 || stsc.len < 8 || stts.len < 8) break;
    uint32_t sample_size = be32(stsz.p + 4);
    uint32_t sample_count = be32(stsz.p + 8);
    if (sample_size == 0) {
      uint64_t cap = (stsz.len - 12) / 4;
      if (sample_count > cap) sample_count = uint32_t(cap);
    } else if (sample_count > len) {
      // constant-size samples carry no table; bound by file size
      sample_count = uint32_t(len);
    }
    if (sample_count == 0) break;
    std::vector<uint64_t> sizes(sample_count);
    for (uint32_t i = 0; i < sample_count; ++i)
      sizes[i] = sample_size ? sample_size : be32(stsz.p + 12 + 4 * i);

    uint32_t nco = be32(stco.p + 4);
    {
      uint64_t cap = (stco.len - 8) / (co64 ? 8 : 4);
      if (nco > cap) nco = uint32_t(cap);
    }
    std::vector<uint64_t> chunk_off(nco);
    for (uint32_t i = 0; i < nco; ++i)
      chunk_off[i] = co64 ? be64(stco.p + 8 + 8 * i) : be32(stco.p + 8 + 4 * i);

    // expand stsc to per-sample offsets
    uint32_t nsc = be32(stsc.p + 4);
    {
      uint64_t cap = (stsc.len - 8) / 12;
      if (nsc > cap) nsc = uint32_t(cap);
    }
    std::vector<uint64_t> sample_off(sample_count);
    {
      uint32_t si = 0;
      for (uint32_t ri = 0; ri < nsc && si < sample_count; ++ri) {
        uint32_t first = be32(stsc.p + 8 + 12 * ri);
        uint32_t spc = be32(stsc.p + 8 + 12 * ri + 4);
        uint32_t last = (ri + 1 < nsc) ? be32(stsc.p + 8 + 12 * (ri + 1)) - 1
                                       : nco;
        for (uint32_t ch = first; ch <= last && si < sample_count; ++ch) {
          if (ch == 0 || ch > nco) break;
          uint64_t base = chunk_off[ch - 1];
          for (uint32_t s = 0; s < spc && si < sample_count; ++s) {
            sample_off[si] = base;
            base += sizes[si];
            ++si;
          }
        }
      }
    }

    // per-sample durations (seconds) from stts
    uint32_t nst = be32(stts.p + 4);
    {
      uint64_t cap = (stts.len - 8) / 8;
      if (nst > cap) nst = uint32_t(cap);
    }
    std::vector<double> durs;
    durs.reserve(sample_count);
    for (uint32_t i = 0; i < nst && durs.size() < sample_count; ++i) {
      uint32_t cnt = be32(stts.p + 8 + 8 * i);
      uint32_t delta = be32(stts.p + 8 + 8 * i + 4);
      for (uint32_t c = 0; c < cnt && durs.size() < sample_count; ++c)
        durs.push_back(double(delta) / timescale);
    }
    while (durs.size() < sample_count) durs.push_back(0.0);

    std::vector<double> all_ts, all_gyro;
    double start = 0.0;
    for (uint32_t k = 0; k < sample_count; ++k) {
      // overflow-safe bound: co64 offsets and stsz sizes are raw file
      // values; `off + size` could wrap uint64 and pass a naive check
      if (sample_off[k] > len || sizes[k] > len - sample_off[k]) {
        start += durs[k];
        continue;
      }
      if (is_camm) {
        // one little-endian packet per sample: u16 reserved, u16 type,
        // payload; type 2 = angular velocity, 3x f32 rad/s (public
        // CAMM spec). Host is little-endian, so f32 memcpy suffices.
        if (sizes[k] >= 16) {
          const uint8_t* p = buf + sample_off[k];
          uint16_t typ = uint16_t(p[2]) | (uint16_t(p[3]) << 8);
          if (typ == 2) {
            float v[3];
            std::memcpy(v, p + 4, 12);
            all_ts.push_back(start);
            for (int c = 0; c < 3; ++c) all_gyro.push_back(double(v[c]));
          }
        }
        start += durs[k];
        continue;
      }
      std::vector<Stream> streams;
      parse_klv(buf, sample_off[k], sample_off[k] + sizes[k], &streams,
                nullptr);
      for (auto& s : streams) {
        if (s.n == 0) continue;
        // SCAL divide (scalar or per-axis)
        if (!s.scal.empty()) {
          for (size_t r = 0; r < s.n; ++r)
            for (size_t c = 0; c < 3; ++c)
              s.gyro[r * 3 + c] /=
                  (s.scal.size() == 3 ? s.scal[c] : s.scal[0]);
        }
        orin_remap(s.gyro, s.n, s.orin, s.orio);
        for (size_t r = 0; r < s.n; ++r) {
          all_ts.push_back(start + durs[k] * double(r) / double(s.n));
          for (size_t c = 0; c < 3; ++c) all_gyro.push_back(s.gyro[r * 3 + c]);
        }
      }
      start += durs[k];
    }
    if (all_ts.empty()) break;

    size_t n = all_ts.size();
    std::vector<double> g = all_gyro;
    if (!user_orient(g, n, orient)) break;

    result.samples = n;
    result.timestamps = static_cast<double*>(malloc(n * sizeof(double)));
    result.gyro = static_cast<double*>(malloc(n * 3 * sizeof(double)));
    std::memcpy(result.timestamps, all_ts.data(), n * sizeof(double));
    std::memcpy(result.gyro, g.data(), n * 3 * sizeof(double));
  } while (false);

  munmap(map, len);
  return result;
}

extern "C" void tp_free(tp_gyrodata d) {
  if (d.timestamps) free(d.timestamps);
  if (d.gyro) free(d.gyro);
}
