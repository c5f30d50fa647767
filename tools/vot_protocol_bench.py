"""Benchmark-scale batched VOT restart protocol on the chip.

Builds a synthetic VOT2018-shaped benchmark (default 60 videos, 300-1500
frames, one canvas size like a typical VOT sequence) whose targets move
smoothly between random SCENE CUTS where they teleport (and sometimes
resize) — a trained dev-scale tracker follows them between cuts and
loses them at cuts, so the restart protocol (failure -> 5-frame skip ->
re-init; ref: scripts/test_usot.py:85-103) fires ORGANICALLY, not by
forced gt injection. Video 0 shrinks its target across a cut so the
re-init flips the big/small instance choice and exercises the batched
engine's instance-size SPILL to the scan path (cli/test.py
track_dataset_vot_batched).

Runs the REAL CLI (`cli.test --engine batch` and `--engine scan`) over
the same benchmark with the same checkpoint, compares the baseline
result files (restart skeleton must match; bbox rows agree to the
batched-vs-single f32 tolerance documented in tests/test_lockstep.py),
and records aggregate protocol fps per engine in VOTBENCH_r05.json.

Usage (chip):  python tools/vot_protocol_bench.py
Smoke (CPU):   python tools/vot_protocol_bench.py --videos 4 \
                   --min-frames 24 --max-frames 48 --h 160 --w 200 \
                   --chunk 8 --batch 2
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_benchmark(root: str, n_videos: int, min_frames: int,
                  max_frames: int, h: int, w: int, seed: int = 0):
    """Write a VOT2018-layout benchmark under <root>/VOT2018."""
    import cv2

    base = os.path.join(root, "VOT2018")
    marker = os.path.join(base, ".generated.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)

    rng = np.random.default_rng(seed)
    names, total_frames, total_cuts = [], 0, 0
    # area threshold for the big/small search choice is 0.004 of the
    # frame (lib/tracker/usot_tracker.py:44-49): targets above it get
    # instance 255, below it 271
    thresh_side = float(np.sqrt(0.004 * h * w))

    for vi in range(n_videos):
        name = "spill" if vi == 0 else f"vid{vi:03d}"
        names.append(name)
        vdir = os.path.join(base, name)
        os.makedirs(vdir, exist_ok=True)
        n = int(rng.integers(min_frames, max_frames + 1))
        total_frames += n

        bg = (rng.random((h, w, 3)) * 200).astype(np.uint8)
        color = rng.integers(60, 255, 3)
        # most targets comfortably above the threshold (small_sz group),
        # every 7th below it (big_sz group) so both engines exist
        if vi % 7 == 3:
            size = float(rng.uniform(0.45, 0.75) * thresh_side)
        else:
            size = float(rng.uniform(1.4, 3.0) * thresh_side)
        # scene cuts: teleport + occasional resize, every ~120-300 frames
        cuts = []
        f = int(rng.integers(120, 300))
        while f < n - 30:
            cuts.append(f)
            f += int(rng.integers(120, 300))
        if vi == 0:
            # the spill video: guarantee one cut that shrinks the target
            # below the threshold, so the re-init flips the instance size
            cuts = cuts or [min(150, n - 30)]
        total_cuts += len(cuts)

        margin = size / 2 + 4
        cx = float(rng.uniform(margin, w - margin))
        cy = float(rng.uniform(margin, h - margin))
        vel = rng.uniform(-1.5, 1.5, 2)
        gts = []
        cut_i = 0
        for fi in range(n):
            if cut_i < len(cuts) and fi == cuts[cut_i]:
                if vi == 0 and cut_i == 0:
                    size = float(0.55 * thresh_side)  # flips to big_sz
                elif rng.random() < 0.3:
                    size = float(np.clip(size * rng.uniform(0.7, 1.4),
                                         12, min(h, w) / 3))
                margin = size / 2 + 4
                # teleport far enough that the old search window
                # can't see the new location
                for _ in range(50):
                    nx = float(rng.uniform(margin, w - margin))
                    ny = float(rng.uniform(margin, h - margin))
                    if abs(nx - cx) + abs(ny - cy) > 0.6 * min(h, w):
                        break
                cx, cy = nx, ny
                vel = rng.uniform(-1.5, 1.5, 2)
                cut_i += 1
            else:
                cx += float(vel[0]) + 0.4 * np.sin(fi / 17.0)
                cy += float(vel[1]) + 0.4 * np.cos(fi / 23.0)
                margin = size / 2 + 4
                if not (margin <= cx <= w - margin):
                    vel[0] = -vel[0]
                    cx = float(np.clip(cx, margin, w - margin))
                if not (margin <= cy <= h - margin):
                    vel[1] = -vel[1]
                    cy = float(np.clip(cy, margin, h - margin))

            im = bg.copy()
            jit = rng.integers(-10, 10, 3)
            c = np.clip(color + jit, 0, 255)
            x1, y1 = int(cx - size / 2), int(cy - size / 2)
            s = int(size)
            im[max(0, y1):y1 + s, max(0, x1):x1 + s] = c
            cv2.imwrite(os.path.join(vdir, f"{fi + 1:08d}.jpg"), im,
                        [cv2.IMWRITE_JPEG_QUALITY, 85])
            x0, x1f = cx - size / 2, cx + size / 2
            y0, y1f = cy - size / 2, cy + size / 2
            gts.append([x0, y0, x1f, y0, x1f, y1f, x0, y1f])

        with open(os.path.join(vdir, "groundtruth.txt"), "w") as f:
            for g in gts:
                f.write(",".join(f"{v:.4f}" for v in g) + "\n")

    with open(os.path.join(base, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    meta = {"videos": len(names), "total_frames": total_frames,
            "cuts": total_cuts, "h": h, "w": w}
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def run_engine(engine: str, root: str, result_dir: str, ckpt: str,
               chunk: int, batch: int, extra=()):
    cmd = [sys.executable, "-m", "usot_tpu.cli.test",
           "--dataset", "VOT2018", "--dataset_root", root,
           "--engine", engine, "--resume", ckpt,
           "--result_dir", result_dir, "--chunk", str(chunk),
           "--batch", str(batch), *extra]
    print("==>", " ".join(cmd), flush=True)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, "var/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "5"
    t0 = time.perf_counter()
    out = subprocess.run(cmd, cwd=REPO, env=env, check=True,
                         capture_output=True, text=True)
    dt = time.perf_counter() - t0
    sys.stdout.write(out.stdout)
    spills = len(re.findall(r"^spill: ", out.stdout, re.M))
    return dt, spills


def read_results(result_dir: str):
    base = os.path.join(result_dir, "VOT2018", "USOT", "baseline")
    out = {}
    for name in sorted(os.listdir(base)):
        path = os.path.join(base, name, name + "_001.txt")
        rows = []
        with open(path) as f:
            for ln in f:
                parts = ln.strip().split(",")
                rows.append(int(float(parts[0])) if len(parts) == 1
                            else [float(v) for v in parts])
        out[name] = rows
    return out


def skeleton(rows):
    return [r if isinstance(r, int) else "b" for r in rows]


def compare_results(a, b):
    """Characterize batch-vs-scan agreement.

    Lockstep batching changes f32 reduction/fusion order, so per-step
    deltas are ~1e-4 px (tests/test_lockstep.py); over hundreds of
    frames near a LOST target (response-map argmax near ties) the
    deltas amplify chaotically and a marginal overlap check can flip a
    failure by a few frames, after which the two trajectories
    legitimately diverge (different re-init frame). The summary
    separates the two regimes: identical-skeleton prefix fraction +
    per-frame delta percentiles within it, and per-video divergence
    points (each after N identical restarts) outside it."""
    assert sorted(a) == sorted(b)
    mism, deltas, ident_frames, total_frames = [], [], 0, 0
    for name in sorted(a):
        sa, sb = skeleton(a[name]), skeleton(b[name])
        n = len(sa)
        total_frames += n
        if sa != sb:
            f = next(i for i, (x, y) in enumerate(zip(sa, sb)) if x != y)
            ident_frames += f
            mism.append({
                "video": name, "first_mismatch_frame": f, "frames": n,
                "identical_restarts_before": sum(
                    1 for r in a[name][:f] if r == 2)})
            continue
        ident_frames += n
        for ra, rb in zip(a[name], b[name]):
            if not isinstance(ra, int):
                deltas.append(float(np.max(np.abs(
                    np.asarray(ra) - np.asarray(rb)))))
    d = np.asarray(deltas) if deltas else np.zeros(1)
    pct = np.percentile(d, [50, 90, 99])
    summary = {
        "skeleton_identical_videos": len(a) - len(mism),
        "videos": len(a),
        "identical_prefix_frames_pct": round(100 * ident_frames
                                             / total_frames, 2),
        "skeleton_divergences": mism,
        "bbox_delta_px_on_identical_skeletons": {
            "median": round(float(pct[0]), 5),
            "p90": round(float(pct[1]), 5),
            "p99": round(float(pct[2]), 4),
            "max": round(float(d.max()), 4),
            "frames_over_1px": int((d > 1).sum()),
            "frames": len(deltas),
        },
    }
    print(f"compare: skeletons identical in "
          f"{summary['skeleton_identical_videos']}/{len(a)} videos "
          f"({summary['identical_prefix_frames_pct']}% of frames in "
          f"identical prefixes); bbox delta median "
          f"{pct[0]:.5f} px, p90 {pct[1]:.5f}, max {d.max():.2f}",
          flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="var/vot_bench")
    ap.add_argument("--videos", type=int, default=60)
    ap.add_argument("--min-frames", type=int, default=300)
    ap.add_argument("--max-frames", type=int, default=1500)
    ap.add_argument("--h", type=int, default=360)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ckpt",
                    default="var/full_schedule/unbroken/snapshot/"
                            "checkpoint_e30.ckpt")
    ap.add_argument("--out", default="VOTBENCH_r05.json")
    ap.add_argument("--skip-scan", action="store_true",
                    help="only run the batched engine (no file compare)")
    ap.add_argument("--width", type=int, default=None,
                    help="model width override (e.g. 8 for the committed "
                         "tiny fixture)")
    ap.add_argument("--channels", type=int, default=None)
    args = ap.parse_args()

    root = os.path.join(REPO, args.root)
    t0 = time.perf_counter()
    meta = gen_benchmark(root, args.videos, args.min_frames,
                         args.max_frames, args.h, args.w)
    print(f"benchmark: {meta} (gen/cached "
          f"{time.perf_counter() - t0:.0f}s)", flush=True)

    ckpt = os.path.join(REPO, args.ckpt) if not os.path.isabs(args.ckpt) \
        else args.ckpt
    engines = ["batch"] if args.skip_scan else ["batch", "scan"]
    extra = []
    if args.width is not None:
        extra += ["--width", str(args.width)]
    if args.channels is not None:
        extra += ["--channels", str(args.channels)]
    runs = {}
    for engine in engines:
        rdir = os.path.join(root, f"result_{engine}")
        if os.path.isdir(rdir):  # the CLI skips existing result files
            import shutil
            shutil.rmtree(rdir)
        dt, spills = run_engine(engine, root, rdir, ckpt, args.chunk,
                                args.batch, extra=extra)
        results = read_results(rdir)
        restarts = sum(sum(1 for r in rows if r == 2)
                       for rows in results.values())
        total_rows = sum(len(rows) for rows in results.values())
        runs[engine] = dict(wall_s=round(dt, 1),
                            fps=round(total_rows / dt, 1),
                            restarts=restarts, spills=spills,
                            total_frames=total_rows, results=results)
        print(f"{engine}: {total_rows} frames in {dt:.1f}s = "
              f"{total_rows / dt:.1f} fps aggregate, {restarts} organic "
              f"restarts, {spills} instance spills", flush=True)

    out = {
        "what": "benchmark-scale batched VOT restart protocol "
                "(ref: scripts/test_usot.py:85-103)",
        "benchmark": meta,
        "checkpoint": args.ckpt,
        "chunk": args.chunk, "lanes": args.batch,
    }
    for engine in engines:
        out[engine] = {k: v for k, v in runs[engine].items()
                       if k != "results"}

    if not args.skip_scan:
        out["compare"] = compare_results(runs["batch"]["results"],
                                         runs["scan"]["results"])

    import jax
    out["device"] = str(jax.devices()[0])
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
