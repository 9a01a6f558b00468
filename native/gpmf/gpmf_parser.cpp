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

#include <cctype>
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

  // GyroFlow JSON telemetry: first non-whitespace byte '{' or '['
  {
    size_t i = 0;
    while (i < len && std::isspace(buf[i])) ++i;
    if (i < len && (buf[i] == '{' || buf[i] == '[')) {
      std::vector<double> ts, gy;
      if (parse_gyroflow_json(buf + i, len - i, &ts, &gy) && !ts.empty() &&
          user_orient(gy, ts.size(), orient)) {
        size_t n = ts.size();
        result.samples = n;
        result.timestamps = static_cast<double*>(malloc(n * sizeof(double)));
        result.gyro = static_cast<double*>(malloc(n * 3 * sizeof(double)));
        std::memcpy(result.timestamps, ts.data(), n * sizeof(double));
        std::memcpy(result.gyro, gy.data(), n * 3 * sizeof(double));
      }
      munmap(map, len);
      return result;
    }
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
