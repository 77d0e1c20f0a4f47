// Native Wavefront OBJ loader.
//
// Reference slot: the mesh ingestion half of the reference's scene
// compile — Unity's asset importer feeding MeshData into
// AddMeshRuntimeEntitiesJob (Jobs/AddMeshRuntimeEntitiesJob.cs:15-92).
// The TPU build's data-loader is this C++ parser exposed through the
// same C ABI / ctypes pattern as the native BVH builder
// (native/bvh_native.py); models/meshes.py:load_obj is the pure-Python
// fallback and the semantic oracle (tests compare the two loaders
// field-for-field).
//
// Semantics (kept identical to the Python loader):
//   * v / vn / vt / f records; anything else ignored.
//   * f refs are v, v/t, v//n or v/t/n; 1-based, negative = from end.
//   * polygons are fan-triangulated: (r0, rk, rk+1).
//   * normals/uvs are re-indexed per POSITION index, last one wins;
//     positions never referenced with a normal get (0,1,0), with no uv
//     get (0,0).  Presence flags say whether ANY vn / vt ref appeared.
//   * any out-of-range or non-numeric f ref FAILS the whole parse
//     (rtiw_obj_load returns null) — the Python loader raises there, and
//     the binding falls back to it for the readable error.  Lines and
//     polygons are unbounded (getline + growable token vector).
//
// Build: make -C raytracing_in_one_weekend_tpu/native
//
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;                 // (V, 3) flattened
  std::vector<int32_t> faces;               // (F, 3) flattened
  std::unordered_map<int32_t, std::array<float, 3>> v_norm;
  std::unordered_map<int32_t, std::array<float, 2>> v_uv;
};

// Whitespace-splitting tokenizer over one line (Python line.split()).
inline void split(char* line, std::vector<char*>& tok) {
  tok.clear();
  char* p = line;
  while (*p) {
    while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') ++p;
    if (!*p) break;
    tok.push_back(p);
    while (*p && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
    if (*p) *p++ = '\0';
  }
}

// 1-based (negative = from end) -> 0-based, or -1 when out of range or
// not a number (Python int() would raise there).
inline int32_t resolve(const char* s, size_t count) {
  char* end = nullptr;
  const long idx = std::strtol(s, &end, 10);
  if (end == s) return -1;  // no digits at all
  const long r = idx > 0 ? idx - 1 : static_cast<long>(count) + idx;
  if (r < 0 || r >= static_cast<long>(count)) return -1;
  return static_cast<int32_t>(r);
}

ObjData* parse(const char* path) {
  FILE* fh = std::fopen(path, "rb");
  if (!fh) return nullptr;
  auto* d = new ObjData;
  std::vector<float> norms;  // (N, 3)
  std::vector<float> uvs;    // (T, 2)
  char* buf = nullptr;
  size_t cap = 0;
  std::vector<char*> tok;
  std::vector<int32_t> refs;
  bool ok = true;
  while (ok && ::getline(&buf, &cap, fh) != -1) {
    split(buf, tok);
    if (tok.empty()) continue;
    if (!std::strcmp(tok[0], "v") && tok.size() >= 4) {
      for (int k = 1; k <= 3; ++k)
        d->verts.push_back(std::strtof(tok[k], nullptr));
    } else if (!std::strcmp(tok[0], "vn") && tok.size() >= 4) {
      for (int k = 1; k <= 3; ++k)
        norms.push_back(std::strtof(tok[k], nullptr));
    } else if (!std::strcmp(tok[0], "vt") && tok.size() >= 3) {
      for (int k = 1; k <= 2; ++k)
        uvs.push_back(std::strtof(tok[k], nullptr));
    } else if (!std::strcmp(tok[0], "f") && tok.size() >= 4) {
      refs.clear();
      const size_t n_v = d->verts.size() / 3;
      for (size_t k = 1; k < tok.size() && ok; ++k) {
        char* s = tok[k];
        char* slash1 = std::strchr(s, '/');
        const int32_t vi = resolve(s, n_v);
        if (vi < 0) {
          ok = false;
          break;
        }
        if (slash1) {
          char* slash2 = std::strchr(slash1 + 1, '/');
          if (slash1[1] && slash1[1] != '/') {  // texcoord field
            const int32_t ti = resolve(slash1 + 1, uvs.size() / 2);
            if (ti < 0) {
              ok = false;
              break;
            }
            d->v_uv[vi] = {uvs[2 * ti], uvs[2 * ti + 1]};
          }
          if (slash2 && slash2[1]) {  // normal field
            const int32_t ni = resolve(slash2 + 1, norms.size() / 3);
            if (ni < 0) {
              ok = false;
              break;
            }
            d->v_norm[vi] = {norms[3 * ni], norms[3 * ni + 1],
                             norms[3 * ni + 2]};
          }
        }
        refs.push_back(vi);
      }
      for (size_t k = 1; ok && k + 1 < refs.size(); ++k) {
        d->faces.push_back(refs[0]);
        d->faces.push_back(refs[k]);
        d->faces.push_back(refs[k + 1]);
      }
    }
  }
  std::free(buf);
  std::fclose(fh);
  if (!ok) {
    delete d;
    return nullptr;
  }
  return d;
}

}  // namespace

extern "C" {

void* rtiw_obj_load(const char* path) { return parse(path); }

// out = {n_verts, n_tris, has_normals, has_uvs}
void rtiw_obj_counts(void* handle, int32_t* out) {
  auto* d = static_cast<ObjData*>(handle);
  out[0] = static_cast<int32_t>(d->verts.size() / 3);
  out[1] = static_cast<int32_t>(d->faces.size() / 3);
  out[2] = d->v_norm.empty() ? 0 : 1;
  out[3] = d->v_uv.empty() ? 0 : 1;
}

// Buffers sized per rtiw_obj_counts: verts (V,3), faces (F,3),
// normals (V,3), uvs (V,2).  normals/uvs may be null when absent.
void rtiw_obj_export(void* handle, float* verts, int32_t* faces,
                     float* normals, float* uvs) {
  auto* d = static_cast<ObjData*>(handle);
  std::memcpy(verts, d->verts.data(), d->verts.size() * sizeof(float));
  std::memcpy(faces, d->faces.data(), d->faces.size() * sizeof(int32_t));
  const size_t n_v = d->verts.size() / 3;
  if (normals && !d->v_norm.empty()) {
    std::memset(normals, 0, n_v * 3 * sizeof(float));
    for (const auto& kv : d->v_norm)
      std::memcpy(normals + 3 * kv.first, kv.second.data(),
                  3 * sizeof(float));
    for (size_t i = 0; i < n_v; ++i) {  // unreferenced -> +y (Python rule)
      float* n = normals + 3 * i;
      if (n[0] == 0.f && n[1] == 0.f && n[2] == 0.f) n[1] = 1.f;
    }
  }
  if (uvs && !d->v_uv.empty()) {
    std::memset(uvs, 0, n_v * 2 * sizeof(float));
    for (const auto& kv : d->v_uv)
      std::memcpy(uvs + 2 * kv.first, kv.second.data(), 2 * sizeof(float));
  }
}

void rtiw_obj_free(void* handle) { delete static_cast<ObjData*>(handle); }

}  // extern "C"
