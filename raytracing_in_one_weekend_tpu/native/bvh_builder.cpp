// Native BVH builder.
//
// Reference slot: the reference's scene compile runs its BVH build as
// Burst-compiled native code (BuildBvhJob, Unity/BvhNodeData.cs:95-238,
// flattened by Runtime/Jobs/BuildRuntimeBvhJob.cs:11-40).  The TPU build's
// equivalent control-plane component: the same longest-axis
// midpoint-partition build as scene/bvh.py:build_bvh, in C++ for large
// scenes (meshes), exposed through a C ABI consumed via ctypes
// (native/bvh_native.py).  Output arrays are bit-identical to the NumPy
// builder's (verified by tests/test_bvh.py).
//
// Build: make -C raytracing_in_one_weekend_tpu/native
//
#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Bvh {
  std::vector<float> node_min, node_max;   // (M, 3)
  std::vector<int32_t> left, right, leaf_id;  // (M,)
  std::vector<std::vector<int32_t>> leaf_entities;  // entity ids per leaf
};

struct Builder {
  const int32_t* kinds;
  const int32_t* indices;
  const float* aabb_min;  // (n, 3)
  const float* aabb_max;
  int max_depth;
  int leaf_size;
  Bvh out;

  int new_node() {
    out.node_min.insert(out.node_min.end(), {0.f, 0.f, 0.f});
    out.node_max.insert(out.node_max.end(), {0.f, 0.f, 0.f});
    out.left.push_back(-1);
    out.right.push_back(-1);
    out.leaf_id.push_back(-1);
    return static_cast<int>(out.left.size()) - 1;
  }

  int build(std::vector<int32_t>& ids, int depth) {
    const int me = new_node();
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t id : ids) {
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], aabb_min[3 * id + a]);
        hi[a] = std::max(hi[a], aabb_max[3 * id + a]);
      }
    }
    for (int a = 0; a < 3; ++a) {
      out.node_min[3 * me + a] = lo[a];
      out.node_max[3 * me + a] = hi[a];
    }

    if (depth >= max_depth ||
        static_cast<int>(ids.size()) <= leaf_size) {
      out.leaf_id[me] = static_cast<int32_t>(out.leaf_entities.size());
      out.leaf_entities.push_back(ids);
      return me;
    }

    float extent[3] = {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]};
    int axis = 0;
    if (extent[1] > extent[axis]) axis = 1;
    if (extent[2] > extent[axis]) axis = 2;
    std::stable_sort(ids.begin(), ids.end(), [&](int32_t a, int32_t b) {
      return aabb_min[3 * a + axis] < aabb_min[3 * b + axis];
    });
    const float mid = lo[axis] + extent[axis] * 0.5f;
    // first entity whose min bound passes the midpoint (searchsorted left)
    size_t split = std::lower_bound(
        ids.begin(), ids.end(), mid,
        [&](int32_t a, float v) { return aabb_min[3 * a + axis] < v; }) -
        ids.begin();
    if (split == 0 || split >= ids.size()) split = ids.size() / 2;

    std::vector<int32_t> left_ids(ids.begin(), ids.begin() + split);
    std::vector<int32_t> right_ids(ids.begin() + split, ids.end());
    const int l = build(left_ids, depth + 1);
    const int r = build(right_ids, depth + 1);
    out.left[me] = l;
    out.right[me] = r;
    return me;
  }
};

}  // namespace

extern "C" {

// Builds and returns an opaque handle; query sizes, copy out, then free.
void* rtiw_bvh_build(int32_t n, const int32_t* kinds, const int32_t* indices,
                     const float* aabb_min, const float* aabb_max,
                     int32_t max_depth, int32_t leaf_size) {
  auto* b = new Builder{kinds, indices, aabb_min, aabb_max,
                        max_depth, leaf_size, {}};
  std::vector<int32_t> ids(n);
  for (int32_t i = 0; i < n; ++i) ids[i] = i;
  b->build(ids, 0);
  return b;
}

int32_t rtiw_bvh_num_nodes(void* handle) {
  return static_cast<int32_t>(static_cast<Builder*>(handle)->out.left.size());
}

int32_t rtiw_bvh_num_leaves(void* handle) {
  return static_cast<int32_t>(
      static_cast<Builder*>(handle)->out.leaf_entities.size());
}

int32_t rtiw_bvh_leaf_width(void* handle) {
  size_t w = 0;
  for (const auto& ids : static_cast<Builder*>(handle)->out.leaf_entities)
    w = std::max(w, ids.size());
  return static_cast<int32_t>(w);
}

void rtiw_bvh_export(void* handle, float* node_min, float* node_max,
                     int32_t* left, int32_t* right, int32_t* leaf_id,
                     int32_t* leaf_kind, int32_t* leaf_index) {
  Builder* b = static_cast<Builder*>(handle);
  const Bvh& o = b->out;
  const size_t m = o.left.size();
  std::copy(o.node_min.begin(), o.node_min.end(), node_min);
  std::copy(o.node_max.begin(), o.node_max.end(), node_max);
  std::copy(o.left.begin(), o.left.end(), left);
  std::copy(o.right.begin(), o.right.end(), right);
  std::copy(o.leaf_id.begin(), o.leaf_id.end(), leaf_id);
  (void)m;

  size_t width = 0;
  for (const auto& ids : o.leaf_entities) width = std::max(width, ids.size());
  for (size_t li = 0; li < o.leaf_entities.size(); ++li) {
    const auto& ids = o.leaf_entities[li];
    for (size_t k = 0; k < width; ++k) {
      if (k < ids.size()) {
        leaf_kind[li * width + k] = b->kinds[ids[k]];
        leaf_index[li * width + k] = b->indices[ids[k]];
      } else {
        leaf_kind[li * width + k] = -1;
        leaf_index[li * width + k] = 0;
      }
    }
  }
}

void rtiw_bvh_free(void* handle) { delete static_cast<Builder*>(handle); }

}  // extern "C"
