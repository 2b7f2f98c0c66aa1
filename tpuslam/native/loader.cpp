// Native cloud loader — the TPU framework's counterpart of the
// reference's C++/Assimp loading layer (AssimpCloudLoader,
// source/common/loader.cpp:30-66).  Same observable semantics as the
// Python fallback in tpuslam/data/loader.py (the behavioral oracle):
//
//  * OBJ: positions from `v` lines, then one output point per face-corner
//    reference in file order (Assimp's per-corner vertex buffer before
//    triangulation — bunny.obj: 2503 unique v / 14904 merged points,
//    bird.obj: 8752 quads / 35008 merged points).  Faces with fewer than
//    3 corners are ignored; negative indices are relative to the current
//    vertex count.  A face-free OBJ yields the raw vertex list.
//  * OFF: the raw vertex list (header `OFF [nv nf ne]`), comments and
//    blank lines skipped.
//  * Any parse/IO failure yields 0 points (LoadCloud's empty-cloud
//    contract, common.cpp:16-23).
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in this
// environment); build with `make -C tpuslam/native`.

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// read entire file; empty on failure
std::string slurp(const char *path) {
  FILE *fh = std::fopen(path, "rb");
  if (!fh) return {};
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  if (size <= 0) {
    std::fclose(fh);
    return {};
  }
  std::fseek(fh, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  size_t got = std::fread(&buf[0], 1, static_cast<size_t>(size), fh);
  std::fclose(fh);
  buf.resize(got);
  return buf;
}

inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char *next_line(const char *p, const char *end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

long load_obj_points(const std::string &text, std::vector<float> *out) {
  std::vector<float> verts;  // xyz triples
  std::vector<long> corners;
  const char *p = text.data();
  const char *end = p + text.size();
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      const char *q = p + 2;
      float xyz[3];
      bool ok = true;
      for (int i = 0; i < 3; ++i) {
        char *after = nullptr;
        xyz[i] = std::strtof(q, &after);
        if (after == q) { ok = false; break; }
        q = after;
      }
      if (ok) {
        verts.push_back(xyz[0]);
        verts.push_back(xyz[1]);
        verts.push_back(xyz[2]);
      }
    } else if (p < end && p[0] == 'f' &&
               (p + 1 == end || p[1] == ' ' || p[1] == '\t')) {
      const char *q = p + 1;
      std::vector<long> face;
      const long nverts = static_cast<long>(verts.size() / 3);
      while (true) {
        q = skip_ws(q, end);
        if (q >= end || *q == '\n' || *q == '#') break;
        char *after = nullptr;
        long idx = std::strtol(q, &after, 10);
        if (after == q) break;  // not a number: stop parsing this face
        q = after;
        // skip the /vt/vn part of the corner token
        while (q < end && *q != ' ' && *q != '\t' && *q != '\n' &&
               *q != '\r')
          ++q;
        face.push_back(idx > 0 ? idx - 1 : nverts + idx);
      }
      if (face.size() >= 3)
        corners.insert(corners.end(), face.begin(), face.end());
    }
    p = next_line(p, end);
  }
  if (verts.empty()) return 0;
  const long nverts = static_cast<long>(verts.size() / 3);
  if (corners.empty()) {
    *out = std::move(verts);
    return nverts;
  }
  out->reserve(corners.size() * 3);
  for (long c : corners) {
    if (c < 0 || c >= nverts) return 0;  // corrupt index: empty cloud
    out->push_back(verts[3 * c]);
    out->push_back(verts[3 * c + 1]);
    out->push_back(verts[3 * c + 2]);
  }
  return static_cast<long>(corners.size());
}

long load_off_points(const std::string &text, std::vector<float> *out) {
  const char *p = text.data();
  const char *end = p + text.size();
  p = skip_ws(p, end);
  if (end - p < 3 || std::strncmp(p, "OFF", 3) != 0) return 0;
  p += 3;
  long counts[3];
  int have = 0;
  while (have < 3 && p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '\n' || *p == '#') {
      p = next_line(p, end);
      continue;
    }
    char *after = nullptr;
    long v = std::strtol(p, &after, 10);
    if (after == p) return 0;
    counts[have++] = v;
    p = after;
  }
  if (have < 3 || counts[0] <= 0) return 0;
  const long nv = counts[0];
  // Bound nv by what the remaining text could possibly hold (each vertex
  // needs at least 6 bytes: three numbers + separators + newline), so a
  // corrupt header like `OFF 99999999999 0 0` cannot drive reserve() into
  // std::bad_alloc across the C ABI (parse failure must yield 0 points).
  if (nv > static_cast<long>(end - p)) return 0;
  out->reserve(static_cast<size_t>(nv) * 3);
  long filled = 0;
  while (filled < nv && p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '\n' || *p == '#') {
      p = next_line(p, end);
      continue;
    }
    bool ok = true;
    for (int i = 0; i < 3; ++i) {
      char *after = nullptr;
      float v = std::strtof(p, &after);
      if (after == p) { ok = false; break; }
      out->push_back(v);
      p = after;
    }
    if (!ok) break;
    ++filled;
    p = next_line(p, end);
  }
  out->resize(static_cast<size_t>(filled) * 3);
  return filled;
}

long emit(std::vector<float> &&pts, long count, float **out) {
  if (count <= 0) {
    *out = nullptr;
    return 0;
  }
  float *buf =
      static_cast<float *>(std::malloc(pts.size() * sizeof(float)));
  if (!buf) {
    *out = nullptr;
    return 0;
  }
  std::memcpy(buf, pts.data(), pts.size() * sizeof(float));
  *out = buf;
  return count;
}

// No exception may cross the C ABI: any allocation failure (bad_alloc on
// a corrupt file) counts as a parse failure and yields 0 points, matching
// the Python fallback which catches MemoryError.
long load_guarded(const char *path,
                  long (*parse)(const std::string &, std::vector<float> *),
                  float **out) {
  try {
    std::string text = slurp(path);
    if (text.empty()) {
      *out = nullptr;
      return 0;
    }
    std::vector<float> pts;
    long n = parse(text, &pts);
    return emit(std::move(pts), n, out);
  } catch (...) {
    *out = nullptr;
    return 0;
  }
}

}  // namespace

extern "C" {

long tpuslam_load_obj(const char *path, float **out) {
  return load_guarded(path, load_obj_points, out);
}

long tpuslam_load_off(const char *path, float **out) {
  return load_guarded(path, load_off_points, out);
}

void tpuslam_free(float *p) { std::free(p); }
}
