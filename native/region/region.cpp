// VOT region overlap: scanline polygon rasterization + mask intersection.
//
// C++ replacement for the reference's C/Cython region toolkit
// (ref: lib/eval_toolkit/pysot/utils/src/region.c — TraX "modern"
// rasterization path, the default: __flags = 0 at region.c:36, so the
// REGION_LEGACY_RASTERIZATION branches are dead in the reference eval
// toolkit). Arithmetic is float32 where the reference's is (coords are
// stored as float in region_polygon), so overlaps match the compiled
// reference library bit-for-bit — A/B-fuzzed by tools/ab_region.py.
// Exposed via a plain C ABI for ctypes; no Python.h dependency; also
// verified against a pure-NumPy mirror in usot_tpu/eval/region.py.
//
// Build: g++ -O2 -shared -fPIC -o libregion.so region.cpp

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Bounds {
  float top, bottom, left, right;
};

Bounds compute_bounds(const float* x, const float* y, int n) {
  Bounds b{FLT_MAX, -FLT_MAX, FLT_MAX, -FLT_MAX};
  for (int i = 0; i < n; i++) {
    b.top = std::min(b.top, y[i]);
    b.bottom = std::max(b.bottom, y[i]);
    b.left = std::min(b.left, x[i]);
    b.right = std::max(b.right, x[i]);
  }
  return b;
}

Bounds round_bounds(Bounds b) {
  return Bounds{std::floor(b.top), std::ceil(b.bottom), std::floor(b.left),
                std::ceil(b.right)};
}

Bounds intersect_bounds(Bounds a, Bounds b) {
  return Bounds{std::max(a.top, b.top), std::min(a.bottom, b.bottom),
                std::max(a.left, b.left), std::min(a.right, b.right)};
}

// ref region.c:671-679: a float bounding-box IoU whose callers only test
// == 0 — boxes that merely touch at an edge (zero-area intersection)
// count as non-overlapping, unlike a geometric intersection test.
float bounds_overlap(Bounds a, Bounds b) {
  Bounds r = intersect_bounds(a, b);
  float inter = (r.right - r.left) * (r.bottom - r.top);
  float denom = (a.right - a.left) * (a.bottom - a.top) +
                (b.right - b.left) * (b.bottom - b.top) - inter;
  return std::max(0.0f, inter / denom);
}

// Scanline fill of a (pre-offset) polygon into mask (may be null: count only).
// Vertices are rounded to the nearest integer first; a horizontal row fills
// the inclusive span between successive distinct node x's.
long rasterize(const std::vector<float>& px, const std::vector<float>& py,
               char* mask, int width, int height) {
  int n = (int)px.size();
  std::vector<float> x(n), y(n);
  for (int i = 0; i < n; i++) {  // ref round_polygon, region.c:578-590
    x[i] = (float)std::round((double)px[i]);
    y[i] = (float)std::round((double)py[i]);
  }
  if (mask) std::memset(mask, 0, (size_t)width * height);
  long sum = 0;
  std::vector<int> nodes;
  nodes.reserve(n);

  for (int row = 0; row < height; row++) {
    nodes.clear();
    int j = n - 1;
    for (int i = 0; i < n; i++) {
      int yi = (int)y[i], yj = (int)y[j];
      if ((yi <= row && yj > row) || (yj <= row && yi > row) ||
          (yi < row && yj >= row) || (yj < row && yi >= row) ||
          (yi == yj && yi == row)) {
        double r = (double)(y[j] - y[i]);  // float sub, then widen (ref)
        double k = (double)(x[j] - x[i]);
        if (r != 0.0)
          nodes.push_back(
              (int)((double)x[i] + (double)(row - y[i]) / r * k));
      }
      j = i;
    }
    std::sort(nodes.begin(), nodes.end());
    size_t i = 0;
    while (i + 1 < nodes.size()) {
      if (nodes[i] == nodes[i + 1]) {  // point on the scanline: skip dup
        i++;
        continue;
      }
      if (nodes[i] >= width) break;
      if (nodes[i + 1] >= 0) {
        int lo = std::max(nodes[i], 0);
        int hi = std::min(nodes[i + 1], width - 1);
        for (int c = lo; c <= hi; c++) {
          if (mask) mask[(size_t)row * width + c] = 1;
          sum++;
        }
      }
      i += 2;
    }
  }
  return sum;
}

}  // namespace

extern "C" {

// Overlap of two polygons given as flat [x0,y0,x1,y1,...] arrays.
// bounds: top, bottom, left, right (pass -inf/inf for unbounded).
float region_polygon_overlap(const double* p1, int n1, const double* p2,
                             int n2, double b_top, double b_bottom,
                             double b_left, double b_right) {
  // Narrow to float32 exactly like the reference's region_polygon storage
  std::vector<float> x1(n1), y1(n1), x2(n2), y2(n2);
  for (int i = 0; i < n1; i++) {
    x1[i] = (float)p1[2 * i];
    y1[i] = (float)p1[2 * i + 1];
  }
  for (int i = 0; i < n2; i++) {
    x2[i] = (float)p2[2 * i];
    y2[i] = (float)p2[2 * i + 1];
  }

  Bounds limit{(float)b_top, (float)b_bottom, (float)b_left,
               (float)b_right};
  Bounds bb1 =
      intersect_bounds(round_bounds(compute_bounds(x1.data(), y1.data(), n1)),
                       limit);
  Bounds bb2 =
      intersect_bounds(round_bounds(compute_bounds(x2.data(), y2.data(), n2)),
                       limit);

  float ox = std::min(bb1.left, bb2.left);
  float oy = std::min(bb1.top, bb2.top);
  int width = (int)(std::max(bb1.right, bb2.right) - ox) + 1;
  int height = (int)(std::max(bb1.bottom, bb2.bottom) - oy) + 1;

  double a1 = (double)((bb1.right - bb1.left) * (bb1.bottom - bb1.top));
  double a2 = (double)((bb2.right - bb2.left) * (bb2.bottom - bb2.top));
  if (a1 / a2 < 1e-10 || a2 / a1 < 1e-10 || width < 1 || height < 1) return 0;
  if (bounds_overlap(bb1, bb2) == 0.0f) return 0;

  std::vector<char> m1((size_t)width * height), m2((size_t)width * height);
  std::vector<float> ox1(n1), oy1(n1), ox2(n2), oy2(n2);
  for (int i = 0; i < n1; i++) {
    ox1[i] = x1[i] - ox;
    oy1[i] = y1[i] - oy;
  }
  for (int i = 0; i < n2; i++) {
    ox2[i] = x2[i] - ox;
    oy2[i] = y2[i] - oy;
  }
  rasterize(ox1, oy1, m1.data(), width, height);
  rasterize(ox2, oy2, m2.data(), width, height);

  long inter = 0, uni = 0;
  for (size_t i = 0; i < m1.size(); i++) {
    if (m1[i] && m2[i]) inter++;
    if (m1[i] || m2[i]) uni++;
  }
  if (uni == 0) return 0;
  return (float)inter / (float)uni;
}

// Batched trajectory overlap: polys packed as offsets; special frames
// (count<=1) produce NaN.
void region_overlap_traj(const double* coords1, const int* counts1,
                         const double* coords2, const int* counts2,
                         int n_frames, double b_top, double b_bottom,
                         double b_left, double b_right, float* out) {
  const double* c1 = coords1;
  const double* c2 = coords2;
  for (int f = 0; f < n_frames; f++) {
    int n1 = counts1[f], n2 = counts2[f];
    if (n1 <= 1 || n2 <= 1) {
      out[f] = NAN;
    } else {
      out[f] = region_polygon_overlap(c1, n1, c2, n2, b_top, b_bottom, b_left,
                                      b_right);
    }
    c1 += 2 * n1;
    c2 += 2 * n2;
  }
}

}  // extern "C"
