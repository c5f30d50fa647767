"""TPU benchmarks for the lockstep protocol drivers (round 4).

1. --vot: the batched VOT restart protocol at B lanes on a synthetic
   VOT-style benchmark with FORCED failures (gt outside the canvas at
   chosen frames -> every tracker fails there, so the restart count is
   controlled). Frames staged into HBM (same staged-vs-streaming
   methodology as bench.py); reports aggregate protocol fps — the number
   that shows the 33x lockstep headline surviving the restart protocol.

2. --refill: lane refill vs fixed padded groups on a 10:1 length-skew
   benchmark (2 long + many short videos, long videos split across
   padded groups the way arbitrary benchmark ordering would). Both paths
   tunnel-fed identically; the ratio isolates the padding waste.

Usage: python tools/bench_lockstep.py [--vot] [--refill] [--batch 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_video(n_frames, h=480, w=640, seed=0, box=48):
    rng = np.random.default_rng(seed)
    frames = np.asarray(rng.random((n_frames, h, w, 3)) * 255, np.uint8)
    centers = []
    cx, cy = 100, 120
    for f in range(n_frames):
        cx = min(cx + 3, w - box)
        cy = min(cy + 2, h - box)
        frames[f, cy - box // 2:cy + box // 2,
               cx - box // 2:cx + box // 2] = [200, 180, 60]
        centers.append((cx, cy))
    return frames, centers


def load_model():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from flax import serialization

    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.runner import ModelRunner

    model = build_usot(mem_size=4, dtype=jnp.bfloat16,
                       fused_xcorr=jax.default_backend() == "tpu")
    cache = "var/bench_variables.msgpack"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
    else:
        from usot_tpu.models.calibrate import calibrate_batch_stats
        variables = init_variables(model, jax.random.PRNGKey(0))
        variables = calibrate_batch_stats(model, variables, n_iter=8)
        os.makedirs("var", exist_ok=True)
        with open(cache, "wb") as f:
            f.write(serialization.to_bytes(variables))
    return model, variables, ModelRunner(model, variables)


def bench_vot(args):
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import BatchScanEngine
    from usot_tpu.tracker.lockstep import run_vot_group

    model, variables, runner = load_model()
    b = args.batch
    n = args.frames
    frames, centers = synthetic_video(n)
    h, w = frames.shape[1:3]
    box = 48.0

    # one shared video tensor; per-lane gt differs only in failure frames
    canvases = [frames] * b
    hws = [(h, w)] * b
    gts = []
    for v in range(b):
        gt = []
        # forced failures: lanes 0..n_fail-1 fail once at spread frames
        fail = {10 + 7 * v} if v < args.failures else set()
        restarts = {f + 5 for f in fail}
        for f in range(n):
            cx, cy = centers[f]
            if f == 0 or f in restarts:
                gt.append([cx - box / 2, cy - box / 2, box, box])
            elif f in fail:
                gt.append([w + 50.0, h + 50.0, 20.0, 20.0])
            else:
                gt.append([0.0, 0.0, float(w), float(h)])
        gts.append(gt)

    p = TrackerConfig()
    p.instance_size = p.big_sz  # 48x48 in 480x640 is < 0.4% -> big
    p.renew()
    p.sf_size = p.score_size
    engine = BatchScanEngine(model, variables, p, canvas_h=h, canvas_w=w,
                             batch=b, max_frames=max(256, n + 8),
                             chunk=args.chunk)

    # warmup/compile pass on a short prefix
    short = [c[:1 + args.chunk] for c in canvases]
    sgts = [g[:1 + args.chunk] for g in gts]
    t0 = time.perf_counter()
    run_vot_group(engine, runner, short, hws, sgts, p.instance_size,
                  small_sz=p.small_sz, big_sz=p.big_sz, stage=True)
    print(f"vot: compile+warmup {time.perf_counter() - t0:.1f}s",
          flush=True)

    reps = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        results = run_vot_group(engine, runner, canvases, hws, gts,
                                p.instance_size, small_sz=p.small_sz,
                                big_sz=p.big_sz, stage=True)
        dt = time.perf_counter() - t0
        total = sum(len(res.regions) for res in results)
        n_restarts = sum(
            sum(1 for x in res.regions if isinstance(x, int) and x == 2)
            for res in results)
        reps.append(total / dt)
        print(f"vot rep {r}: {total} protocol frames, {n_restarts} "
              f"restarts, {dt:.2f}s -> {total / dt:.1f} fps aggregate",
              flush=True)
    print(f"VOT-protocol staged aggregate fps (B={b}, {args.failures} "
          f"forced restarts): median {np.median(reps):.1f}", flush=True)


def bench_refill(args):
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import BatchScanEngine
    from usot_tpu.tracker.lockstep import run_refill_group

    model, variables, runner = load_model()
    b = args.batch
    long_n, short_n = args.frames, max(args.frames // 10, 8)
    h, w = 480, 640
    long_f, centers = synthetic_video(long_n, h, w)
    short_f = long_f[:short_n]

    # 2 long + 22 short videos; arbitrary benchmark order would split the
    # long ones across fixed groups, so interleave them
    specs = []
    for i in range(24):
        is_long = i in (0, 12)
        specs.append(dict(
            name=f"v{i:02d}", canvas=long_f if is_long else short_f,
            h=h, w=w, init_pos=np.array(centers[0], float),
            init_sz=np.array([48.0, 48.0])))

    p = TrackerConfig()
    p.instance_size = p.big_sz
    p.renew()
    p.sf_size = p.score_size
    engine = BatchScanEngine(model, variables, p, canvas_h=h, canvas_w=w,
                             batch=b, max_frames=max(256, long_n + 8),
                             chunk=args.chunk)

    # warmup compile
    t0 = time.perf_counter()
    run_refill_group(engine, runner, specs[:b])
    print(f"refill: compile+warmup {time.perf_counter() - t0:.1f}s",
          flush=True)

    total_frames = sum(len(s["canvas"]) for s in specs)

    t0 = time.perf_counter()
    run_refill_group(engine, runner, specs)
    dt_refill = time.perf_counter() - t0
    print(f"refill: {total_frames} frames in {dt_refill:.2f}s -> "
          f"{total_frames / dt_refill:.1f} fps aggregate", flush=True)

    # fixed padded groups, insertion order (the old track_dataset path)
    t0 = time.perf_counter()
    for i in range(0, len(specs), b):
        group = specs[i:i + b]
        gb = len(group)
        geng = BatchScanEngine(model, variables, p, canvas_h=h,
                               canvas_w=w, batch=gb,
                               max_frames=max(256, long_n + 8),
                               chunk=args.chunk) if gb != b else engine
        vids = [(s["canvas"][0], s["init_pos"], s["init_sz"])
                for s in group]
        state = geng.init_batch(vids, runner)
        max_n = max(len(s["canvas"]) for s in group) - 1
        bf = np.zeros((gb, max_n, h, w, 3), np.uint8)
        nv = []
        for vi, s in enumerate(group):
            bf[vi, :len(s["canvas"]) - 1] = s["canvas"][1:]
            nv.append(len(s["canvas"]) - 1)
        geng.track_batch(state, bf, n_valid=np.asarray(nv))
    dt_padded = time.perf_counter() - t0
    print(f"padded: {total_frames} frames in {dt_padded:.2f}s -> "
          f"{total_frames / dt_padded:.1f} fps aggregate", flush=True)
    print(f"refill speedup on 10:1 skew: {dt_padded / dt_refill:.2f}x",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vot", action="store_true")
    ap.add_argument("--refill", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--failures", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.vot:
        bench_vot(args)
    if args.refill:
        bench_refill(args)


if __name__ == "__main__":
    main()
