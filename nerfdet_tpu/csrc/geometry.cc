// Native host-side 3D box geometry kernels.
//
// C++ equivalents of the reference's CUDA extensions used on its
// evaluation / post-processing path (SURVEY §2.3):
//   * rotated BEV overlap  — mmdet3d/ops/iou3d/src/iou3d_kernel.cu
//     (boxes_overlap_bev_gpu): exact convex polygon clipping.
//   * rotated NMS          — iou3d_kernel.cu nms_gpu (BEV IoU greedy).
//   * aligned 3D NMS       — core/post_processing/box3d_nms.py:91-138
//     (pure-torch in the reference; here native for eval throughput).
//   * points in boxes      — roiaware_pool3d points_in_boxes_batch.
//
// Box layout everywhere: (cx, cy, z_bottom, dx, dy, dz, yaw), yaw about
// +z — the framework's bottom-centered Depth-frame convention
// (core/boxes.py).
//
// Exposed with C linkage for ctypes (see nerfdet_tpu/ops/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

inline double cross(const Pt &o, const Pt &a, const Pt &b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// BEV footprint corners (ccw) of a (7,) box.
inline void bev_corners(const float *b, Pt out[4]) {
  const double cx = b[0], cy = b[1], dx = b[3], dy = b[4], yaw = b[6];
  const double c = std::cos(yaw), s = std::sin(yaw);
  const double lx[4] = {dx / 2, -dx / 2, -dx / 2, dx / 2};
  const double ly[4] = {dy / 2, dy / 2, -dy / 2, -dy / 2};
  for (int i = 0; i < 4; ++i) {
    out[i].x = lx[i] * c - ly[i] * s + cx;
    out[i].y = lx[i] * s + ly[i] * c + cy;
  }
}

// Sutherland–Hodgman: clip convex polygon `poly` by half-plane left of
// edge (a, b) (ccw clipper).
inline int clip_edge(const Pt *poly, int n, const Pt &a, const Pt &b,
                     Pt *out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt &cur = poly[i];
    const Pt &nxt = poly[(i + 1) % n];
    const double dc = cross(a, b, cur);
    const double dn = cross(a, b, nxt);
    if (dc >= 0) out[m++] = cur;
    if ((dc > 0 && dn < 0) || (dc < 0 && dn > 0)) {
      const double t = dc / (dc - dn);
      out[m++] = {cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
    }
  }
  return m;
}

inline double polygon_area(const Pt *poly, int n) {
  if (n < 3) return 0.0;
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt &p = poly[i];
    const Pt &q = poly[(i + 1) % n];
    area += p.x * q.y - q.x * p.y;
  }
  return std::abs(area) * 0.5;
}

inline double bev_overlap_one(const float *b1, const float *b2) {
  Pt c1[4], c2[4];
  bev_corners(b1, c1);
  bev_corners(b2, c2);
  Pt buf1[16], buf2[16];
  int n = 4;
  std::memcpy(buf1, c1, sizeof(c1));
  Pt *cur = buf1, *nxt = buf2;
  for (int e = 0; e < 4 && n > 0; ++e) {
    n = clip_edge(cur, n, c2[e], c2[(e + 1) % 4], nxt);
    std::swap(cur, nxt);
  }
  return polygon_area(cur, n);
}

inline double iou_bev(const float *b1, const float *b2) {
  const double inter = bev_overlap_one(b1, b2);
  const double a1 = double(b1[3]) * b1[4];
  const double a2 = double(b2[3]) * b2[4];
  return inter / std::max(a1 + a2 - inter, 1e-8);
}

inline double iou_3d(const float *b1, const float *b2) {
  const double inter_bev = bev_overlap_one(b1, b2);
  const double top1 = b1[2] + b1[5], top2 = b2[2] + b2[5];
  const double h =
      std::max(0.0, double(std::min(top1, top2)) - std::max(b1[2], b2[2]));
  const double inter = inter_bev * h;
  const double v1 = double(b1[3]) * b1[4] * b1[5];
  const double v2 = double(b2[3]) * b2[4] * b2[5];
  return inter / std::max(v1 + v2 - inter, 1e-8);
}

}  // namespace

extern "C" {

// Pairwise rotated BEV intersection areas: out[n*m].
void rotated_bev_overlap(const float *boxes1, int64_t n, const float *boxes2,
                         int64_t m, float *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < m; ++j) {
      out[i * m + j] = float(bev_overlap_one(boxes1 + 7 * i, boxes2 + 7 * j));
    }
  }
}

// Pairwise rotated 3D IoU (bottom-centered boxes): out[n*m].
void rotated_iou_3d(const float *boxes1, int64_t n, const float *boxes2,
                    int64_t m, float *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < m; ++j) {
      out[i * m + j] = float(iou_3d(boxes1 + 7 * i, boxes2 + 7 * j));
    }
  }
}

// Greedy rotated-BEV NMS. `order` must be score-descending indices.
// Returns number of kept indices written to `keep`.
int64_t nms_rotated_bev(const float *boxes, const int64_t *order, int64_t n,
                        float thresh, int64_t *keep) {
  std::vector<char> suppressed(n, 0);
  int64_t n_keep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      if (iou_bev(boxes + 7 * i, boxes + 7 * j) > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Greedy class-aware axis-aligned 3D NMS on corner-format boxes
// (x1,y1,z1,x2,y2,z2). `order` score-descending. Matches
// box3d_nms.py:91-138 exactly.
int64_t aligned_nms_3d(const float *boxes, const float *classes,
                       const int64_t *order, int64_t n, float thresh,
                       int64_t *keep) {
  std::vector<char> suppressed(n, 0);
  int64_t n_keep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    const float *a = boxes + 6 * i;
    const double va = double(a[3] - a[0]) * (a[4] - a[1]) * (a[5] - a[2]);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j] || classes[i] != classes[j]) continue;
      const float *b = boxes + 6 * j;
      const double w = std::max(0.f, std::min(a[3], b[3]) - std::max(a[0], b[0]));
      const double h = std::max(0.f, std::min(a[4], b[4]) - std::max(a[1], b[1]));
      const double d = std::max(0.f, std::min(a[5], b[5]) - std::max(a[2], b[2]));
      const double inter = w * h * d;
      const double vb = double(b[3] - b[0]) * (b[4] - b[1]) * (b[5] - b[2]);
      if (inter / (va + vb - inter) > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Farthest-point sampling — host twin of the reference CUDA kernel
// (mmdet3d/ops/furthest_point_sample/src/furthest_point_sample_cuda.cu):
// start at index 0, f32 running min-distance, argmax picks the FIRST
// maximum. Sequential over selections (inherent), OpenMP inside each
// distance update + argmax pass. Moves the PointNet++ backbones'
// only serial op off the TPU step's critical path (data pipeline
// precompute; PERF.md "VoteNet decomposition").
void fps_sample(const float *xyz, int64_t n, int64_t m, int32_t *out) {
  if (n <= 0 || m <= 0) return;
  // SoA copies + three straight-line passes per selection so the
  // compiler vectorizes (the fused update+argmax-tracking loop does
  // not). Single-threaded: the loader parallelizes across scenes.
  std::vector<float> xs(n), ys(n), zs(n);
  for (int64_t k = 0; k < n; ++k) {
    xs[k] = xyz[3 * k];
    ys[k] = xyz[3 * k + 1];
    zs[k] = xyz[3 * k + 2];
  }
  std::vector<float> mind(size_t(n),
                          std::numeric_limits<float>::infinity());
  constexpr int64_t L = 16;  // independent lanes: breaks the serial
                             // max-reduce dependency chain, vectorizes
  int32_t last = 0;
  out[0] = 0;
  for (int64_t i = 1; i < m; ++i) {
    const float lx = xs[last], ly = ys[last], lz = zs[last];
    float *mp = mind.data();
    float lanes[L];
    for (int64_t j = 0; j < L; ++j) lanes[j] = -1.f;
    const int64_t nb = n / L * L;
    for (int64_t k = 0; k < nb; k += L) {
#pragma omp simd
      for (int64_t j = 0; j < L; ++j) {  // fused update + lane maxima
        const float dx = xs[k + j] - lx, dy = ys[k + j] - ly,
                    dz = zs[k + j] - lz;
        const float d = dx * dx + dy * dy + dz * dz;
        const float v = d < mp[k + j] ? d : mp[k + j];
        mp[k + j] = v;
        lanes[j] = v > lanes[j] ? v : lanes[j];
      }
    }
    float best = -1.f;
    for (int64_t j = 0; j < L; ++j) best = std::max(best, lanes[j]);
    for (int64_t k = nb; k < n; ++k) {  // tail
      const float dx = xs[k] - lx, dy = ys[k] - ly, dz = zs[k] - lz;
      const float d = dx * dx + dy * dy + dz * dz;
      const float v = d < mp[k] ? d : mp[k];
      mp[k] = v;
      best = v > best ? v : best;
    }
    int64_t bidx = 0;
    for (int64_t k = 0; k < n; k += L) {  // first occurrence of best
      const int64_t e = std::min(k + L, n);
      bool hit = false;
      for (int64_t j = k; j < e; ++j) hit |= (mp[j] == best);
      if (hit) {
        for (int64_t j = k; j < e; ++j)
          if (mp[j] == best) {
            bidx = j;
            break;
          }
        break;
      }
    }
    last = int32_t(bidx);
    out[i] = last;
  }
}

// ball_query — host twin of the reference CUDA kernel
// (mmdet3d/ops/ball_query/src/ball_query_cuda.cu): per center, the
// first K points within radius in scan order; remaining slots repeat
// the first hit (all zeros when no hit). Early-exits at K like the
// kernel. Direct dx^2+dy^2+dz^2 in f32, matching the CUDA source
// (the on-device JAX twin uses the matmul expansion — membership of
// points numerically AT the radius boundary can differ; both are
// exact ball queries).
void ball_query_host(const float *centers, int64_t c, const float *xyz,
                     int64_t n, float radius, int64_t k, int32_t *out) {
  const float r2 = radius * radius;
  if (n <= 0 || c <= 0 || k <= 0) return;
  // Exact grid hash: cells of edge `radius`, points counting-sorted by
  // cell (stable — within a cell, ascending original index). A ball of
  // radius r spans <= 3 cells per axis; candidates from those cells
  // are gathered, distance-checked with the SAME f32 arithmetic as a
  // linear scan, sorted by original index, and the first K kept —
  // identical output to the O(N)-per-center scan at a fraction of the
  // work (~15-200 candidates vs N).
  float lo[3] = {xyz[0], xyz[1], xyz[2]}, hi[3] = {xyz[0], xyz[1], xyz[2]};
  for (int64_t j = 1; j < n; ++j)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], xyz[3 * j + d]);
      hi[d] = std::max(hi[d], xyz[3 * j + d]);
    }
  const double cell = double(radius) > 1e-12 ? double(radius) : 1e-12;
  int64_t dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max<int64_t>(
        1, int64_t((double(hi[d]) - double(lo[d])) / cell) + 1);
  const int64_t ncell = dims[0] * dims[1] * dims[2];
  auto cell_of = [&](double v, int d) {
    int64_t q = int64_t((v - double(lo[d])) / cell);
    return std::min(std::max<int64_t>(q, 0), dims[d] - 1);
  };
  std::vector<int64_t> start(ncell + 1, 0);
  std::vector<int64_t> cid(n);
  for (int64_t j = 0; j < n; ++j) {
    cid[j] = (cell_of(xyz[3 * j], 0) * dims[1] +
              cell_of(xyz[3 * j + 1], 1)) * dims[2] +
             cell_of(xyz[3 * j + 2], 2);
    ++start[cid[j] + 1];
  }
  for (int64_t q = 0; q < ncell; ++q) start[q + 1] += start[q];
  std::vector<int32_t> bucket(n);
  {
    std::vector<int64_t> cur(start.begin(), start.end() - 1);
    for (int64_t j = 0; j < n; ++j) bucket[cur[cid[j]]++] = int32_t(j);
  }
#pragma omp parallel
  {
    std::vector<int32_t> cand;
#pragma omp for schedule(static)
    for (int64_t i = 0; i < c; ++i) {
      int32_t *row = out + i * k;
      const float cx = centers[3 * i], cy = centers[3 * i + 1],
                  cz = centers[3 * i + 2];
      cand.clear();
      const int64_t ax0 = cell_of(double(cx) - cell, 0),
                    ax1 = cell_of(double(cx) + cell, 0),
                    ay0 = cell_of(double(cy) - cell, 1),
                    ay1 = cell_of(double(cy) + cell, 1),
                    az0 = cell_of(double(cz) - cell, 2),
                    az1 = cell_of(double(cz) + cell, 2);
      for (int64_t qx = ax0; qx <= ax1; ++qx)
        for (int64_t qy = ay0; qy <= ay1; ++qy)
          for (int64_t qz = az0; qz <= az1; ++qz) {
            const int64_t q = (qx * dims[1] + qy) * dims[2] + qz;
            for (int64_t b = start[q]; b < start[q + 1]; ++b) {
              const int32_t j = bucket[b];
              const float dx = xyz[3 * j] - cx, dy = xyz[3 * j + 1] - cy,
                          dz = xyz[3 * j + 2] - cz;
              if (dx * dx + dy * dy + dz * dz < r2) cand.push_back(j);
            }
          }
      std::sort(cand.begin(), cand.end());
      const int64_t cnt = std::min<int64_t>(int64_t(cand.size()), k);
      for (int64_t j = 0; j < cnt; ++j) row[j] = cand[j];
      const int32_t fill = cnt > 0 ? row[0] : 0;
      for (int64_t j = cnt; j < k; ++j) row[j] = fill;
    }
  }
}

// points_in_boxes: for each point, the index of the first box containing
// it (-1 if none) — roiaware_pool3d points_in_boxes_batch semantics.
void points_in_boxes(const float *pts, int64_t p, const float *boxes,
                     int64_t n, int32_t *out) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < p; ++k) {
    const double x = pts[3 * k], y = pts[3 * k + 1], z = pts[3 * k + 2];
    int32_t hit = -1;
    for (int64_t i = 0; i < n && hit < 0; ++i) {
      const float *b = boxes + 7 * i;
      if (z < b[2] || z > b[2] + b[5]) continue;
      const double c = std::cos(-double(b[6])), s = std::sin(-double(b[6]));
      const double lx = (x - b[0]) * c - (y - b[1]) * s;
      const double ly = (x - b[0]) * s + (y - b[1]) * c;
      if (std::abs(lx) <= b[3] / 2.0 && std::abs(ly) <= b[4] / 2.0)
        hit = int32_t(i);
    }
    out[k] = hit;
  }
}

}  // extern "C"
