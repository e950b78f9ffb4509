// Native host-runtime kernels for orbslam3-tpu.
//
// The TPU owns the dense per-pixel/per-keypoint compute (JAX/Pallas); these
// are the *host-side* sequential hot loops, implemented natively where the
// reference keeps them in C++ (role-parity):
//  - distribute_octree: the exact recursive quadtree keypoint spreading
//    (reference ORBextractor::DistributeOctTree semantics,
//    /root/reference/src/ORBextractor.cc:584-774) — kept as the parity
//    oracle for the device grid-top-K selection and usable as a drop-in.
//  - hamming_knn: brute-force 256-bit Hamming k-nearest-neighbors with
//    hardware popcount (ORBmatcher::DescriptorDistance role at batch scale,
//    used by the fisheye BFMatcher-style path).
//  - hamming_radius_count: candidate counting for inverted-file queries.
//
// Built as a plain C ABI shared library; Python binds via ctypes
// (orbslam3_tpu/native/__init__.py) with a pure-NumPy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <list>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// distribute_octree
// ---------------------------------------------------------------------------
struct Node {
  int ul_x, ul_y, br_x, br_y;  // integer node bounds (oracle semantics)
  std::vector<int> idx;
  bool no_more = false;
};

// kps: n x 3 floats (x, y, response) in crop coordinates.
// out_idx: caller-allocated buffer of size n; returns number selected.
int distribute_octree(const float* kps, int n, int min_x, int max_x, int min_y,
                      int max_y, int target, int* out_idx) {
  if (n <= 0) return 0;
  const double w = double(max_x - min_x);
  const double h = double(max_y - min_y);
  int n_ini = std::max(1, int(std::lround(w / h)));
  const double hx = w / n_ini;

  std::list<Node> nodes;
  std::vector<Node*> ini(n_ini);
  for (int i = 0; i < n_ini; ++i) {
    Node nd;
    nd.ul_x = int(hx * i);
    nd.ul_y = 0;
    nd.br_x = int(hx * (i + 1));
    nd.br_y = max_y - min_y;
    nodes.push_back(std::move(nd));
    ini[i] = &nodes.back();
  }
  for (int i = 0; i < n; ++i) {
    int b = std::min(n_ini - 1, int(kps[3 * i] / hx));
    ini[b]->idx.push_back(i);
  }
  for (auto it = nodes.begin(); it != nodes.end();) {
    if (it->idx.empty()) {
      it = nodes.erase(it);
    } else {
      if (it->idx.size() == 1) it->no_more = true;
      ++it;
    }
  }

  auto divide = [&kps](const Node& nd, Node out[4]) {
    const int half_x = int(std::ceil((nd.br_x - nd.ul_x) / 2.0));
    const int half_y = int(std::ceil((nd.br_y - nd.ul_y) / 2.0));
    const int cx = nd.ul_x + half_x;
    const int cy = nd.ul_y + half_y;
    out[0] = {nd.ul_x, nd.ul_y, cx, cy, {}, false};
    out[1] = {cx, nd.ul_y, nd.br_x, cy, {}, false};
    out[2] = {nd.ul_x, cy, cx, nd.br_y, {}, false};
    out[3] = {cx, cy, nd.br_x, nd.br_y, {}, false};
    for (int i : nd.idx) {
      const float x = kps[3 * i], y = kps[3 * i + 1];
      int q = (x < cx ? 0 : 1) + (y < cy ? 0 : 2);
      out[q].idx.push_back(i);
    }
    for (int q = 0; q < 4; ++q)
      if (out[q].idx.size() == 1) out[q].no_more = true;
  };

  bool finished = false;
  std::vector<std::pair<int, Node*>> to_expand;
  while (!finished) {
    const size_t prev_size = nodes.size();
    to_expand.clear();
    // oracle iterates the node list in order, appending surviving no_more
    // nodes and PREPENDING children (insert(0, c) per child -> reversed)
    std::list<Node> new_nodes;
    for (auto it = nodes.begin(); it != nodes.end(); ++it) {
      if (it->no_more) {
        new_nodes.push_back(std::move(*it));
        continue;
      }
      Node kids[4];
      divide(*it, kids);
      for (int q = 0; q < 4; ++q) {
        if (kids[q].idx.empty()) continue;
        new_nodes.push_front(std::move(kids[q]));
        if (new_nodes.front().idx.size() > 1)
          to_expand.emplace_back(int(new_nodes.front().idx.size()),
                                 &new_nodes.front());
      }
    }
    nodes = std::move(new_nodes);
    if (int(nodes.size()) >= target || nodes.size() == prev_size) {
      finished = true;
    } else if (int(nodes.size()) + 3 * int(to_expand.size()) > target) {
      // expand biggest-first (stable by insertion order on ties)
      while (!finished) {
        const size_t prev2 = nodes.size();
        auto prev_expand = to_expand;
        to_expand.clear();
        std::stable_sort(prev_expand.begin(), prev_expand.end(),
                         [](auto& a, auto& b) { return a.first < b.first; });
        for (auto pit = prev_expand.rbegin(); pit != prev_expand.rend(); ++pit) {
          // remove the parent first (oracle: nodes.remove(nd) precedes insert)
          Node parent;
          for (auto it = nodes.begin(); it != nodes.end(); ++it) {
            if (&*it == pit->second) {
              parent = std::move(*it);
              nodes.erase(it);
              break;
            }
          }
          Node kids[4];
          divide(parent, kids);
          for (int q = 0; q < 4; ++q) {
            if (kids[q].idx.empty()) continue;
            nodes.push_front(std::move(kids[q]));
            if (nodes.front().idx.size() > 1)
              to_expand.emplace_back(int(nodes.front().idx.size()),
                                     &nodes.front());
          }
          if (int(nodes.size()) >= target) break;
        }
        if (int(nodes.size()) >= target || nodes.size() == prev2)
          finished = true;
      }
    }
  }

  int out_n = 0;
  for (const auto& nd : nodes) {
    int best = nd.idx[0];
    float best_r = kps[3 * best + 2];
    for (int i : nd.idx) {
      if (kps[3 * i + 2] > best_r) {
        best_r = kps[3 * i + 2];
        best = i;
      }
    }
    out_idx[out_n++] = best;
  }
  return out_n;
}

// ---------------------------------------------------------------------------
// hamming_knn: for each descriptor in A (na x 32 bytes), the k nearest in B.
// out_idx/out_dist: na x k, row-major; missing neighbors get idx -1.
// ---------------------------------------------------------------------------
void hamming_knn(const uint8_t* a, int na, const uint8_t* b, int nb, int k,
                 int32_t* out_idx, int32_t* out_dist) {
  const uint64_t* a64 = reinterpret_cast<const uint64_t*>(a);
  const uint64_t* b64 = reinterpret_cast<const uint64_t*>(b);
  std::vector<int32_t> dists(nb);
  for (int i = 0; i < na; ++i) {
    const uint64_t* ai = a64 + 4 * i;
    for (int j = 0; j < nb; ++j) {
      const uint64_t* bj = b64 + 4 * j;
      dists[j] = __builtin_popcountll(ai[0] ^ bj[0]) +
                 __builtin_popcountll(ai[1] ^ bj[1]) +
                 __builtin_popcountll(ai[2] ^ bj[2]) +
                 __builtin_popcountll(ai[3] ^ bj[3]);
    }
    for (int kk = 0; kk < k; ++kk) {
      int best = -1, best_d = 1 << 30;
      for (int j = 0; j < nb; ++j) {
        if (dists[j] < best_d) {
          best_d = dists[j];
          best = j;
        }
      }
      out_idx[i * k + kk] = best;
      out_dist[i * k + kk] = best >= 0 ? best_d : -1;
      if (best >= 0) dists[best] = 1 << 30;
    }
  }
}

// full pairwise Hamming matrix (na x nb)
void hamming_matrix(const uint8_t* a, int na, const uint8_t* b, int nb,
                    int32_t* out) {
  const uint64_t* a64 = reinterpret_cast<const uint64_t*>(a);
  const uint64_t* b64 = reinterpret_cast<const uint64_t*>(b);
  for (int i = 0; i < na; ++i) {
    const uint64_t* ai = a64 + 4 * i;
    for (int j = 0; j < nb; ++j) {
      const uint64_t* bj = b64 + 4 * j;
      out[i * nb + j] = __builtin_popcountll(ai[0] ^ bj[0]) +
                        __builtin_popcountll(ai[1] ^ bj[1]) +
                        __builtin_popcountll(ai[2] ^ bj[2]) +
                        __builtin_popcountll(ai[3] ^ bj[3]);
    }
  }
}

// ---------------------------------------------------------------------------
// TrackLocalMap projection matcher (the host tracking loop's hottest inner
// loop; mirrors slam/matchers.search_by_projection_local_map bit-for-bit:
// same 64x48 grid walk order, same two-best same-level nn-ratio logic, same
// sequential slot-occupancy semantics).
// ---------------------------------------------------------------------------

int project_match_local(
    const float* proj,        // (M, 5): u, v, ur, level, view_cos
    const uint8_t* mp_desc,   // (M, 32)
    const uint8_t* mp_obs,    // (M,) 1 if the map point has observations
    int m,
    const float* kp_xy,       // (K, 2) undistorted
    const int32_t* kp_level,  // (K,)
    const uint8_t* kp_desc,   // (K, 32)
    const float* kp_ur,       // (K,)
    uint8_t* occupied,        // (K,) in/out: 1 = slot holds a tracked point
    int k,
    const float* scale_factors, int n_levels,
    float th, float ratio, int match_th,
    float min_x, float min_y, float grid_w, float grid_h,
    int32_t* out_idx          // (M,) matched frame slot or -1
) {
  constexpr int GRID_COLS = 64, GRID_ROWS = 48;
  // build the cell buckets exactly as Frame._build_grid (stable by index)
  std::vector<std::vector<int>> cells(GRID_COLS * GRID_ROWS);
  for (int i = 0; i < k; ++i) {
    int cx = int((kp_xy[2 * i] - min_x) / grid_w);
    int cy = int((kp_xy[2 * i + 1] - min_y) / grid_h);
    if (cx >= 0 && cx < GRID_COLS && cy >= 0 && cy < GRID_ROWS)
      cells[cy * GRID_COLS + cx].push_back(i);
  }
  const uint64_t* kd64 = reinterpret_cast<const uint64_t*>(kp_desc);
  const uint64_t* md64 = reinterpret_cast<const uint64_t*>(mp_desc);
  int n_matched = 0;
  for (int p = 0; p < m; ++p) {
    out_idx[p] = -1;
    const float u = proj[5 * p], v = proj[5 * p + 1], ur = proj[5 * p + 2];
    const int level = int(proj[5 * p + 3]);
    const float view_cos = proj[5 * p + 4];
    float r = (view_cos > 0.998f) ? 2.5f : 4.0f;
    r *= th * scale_factors[level];
    const int min_level = level - 1, max_level = level;
    int cx0 = std::max(0, int((u - min_x - r) / grid_w));
    int cx1 = std::min(GRID_COLS - 1, int((u - min_x + r) / grid_w));
    int cy0 = std::max(0, int((v - min_y - r) / grid_h));
    int cy1 = std::min(GRID_ROWS - 1, int((v - min_y + r) / grid_h));
    if (cx1 < cx0 || cy1 < cy0) continue;
    const uint64_t* dp = md64 + 4 * p;
    int best = 256, best2 = 256, best_i = -1, best_lvl = -1, best2_lvl = -1;
    for (int cy = cy0; cy <= cy1; ++cy)
      for (int cx = cx0; cx <= cx1; ++cx)
        for (int i : cells[cy * GRID_COLS + cx]) {
          if (std::fabs(kp_xy[2 * i] - u) >= r) continue;
          if (std::fabs(kp_xy[2 * i + 1] - v) >= r) continue;
          const int lv = kp_level[i];
          if (min_level >= 0 && lv < min_level) continue;
          if (max_level >= 0 && lv > max_level) continue;
          if (occupied[i]) continue;
          if (kp_ur[i] >= 0 && ur >= 0 && std::fabs(ur - kp_ur[i]) > r)
            continue;
          const uint64_t* di = kd64 + 4 * i;
          const int d = __builtin_popcountll(dp[0] ^ di[0]) +
                        __builtin_popcountll(dp[1] ^ di[1]) +
                        __builtin_popcountll(dp[2] ^ di[2]) +
                        __builtin_popcountll(dp[3] ^ di[3]);
          if (d < best) {
            best2 = best; best2_lvl = best_lvl;
            best = d; best_i = i; best_lvl = lv;
          } else if (d < best2) {
            best2 = d; best2_lvl = lv;
          }
        }
    if (best <= match_th && best_i >= 0) {
      if (best_lvl == best2_lvl && float(best) > ratio * float(best2)) continue;
      out_idx[p] = best_i;
      if (mp_obs[p]) occupied[best_i] = 1;
      ++n_matched;
    }
  }
  return n_matched;
}

}  // extern "C"
