"""Headline benchmark: single-chip USOT* tracking FPS with the on-device
scan engine (crop -> backbone -> offline+online heads -> postprocess ->
memory update, all inside one lax.scan per chunk of frames).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference paper's real-time claim (~58 FPS on a single GPU,
arXiv 2108.12711); the repo publishes no FPS table
(ref: scripts/test_usot.py:130-131 only prints per-video FPS).
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)

BASELINE_FPS = 58.0


def synthetic_video(n_frames, h=480, w=640, box=60, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    frames = []
    for f in range(n_frames):
        im = base.copy()
        cx = 200 + int(1.5 * f)
        cy = 240 + int(0.7 * f)
        im[cy - box // 2:cy + box // 2, cx - box // 2:cx + box // 2] = \
            [180, 160, 90]
        frames.append(im)
    return frames


def main():
    import jax

    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import ScanEngine
    from usot_tpu.tracker.runner import ModelRunner

    n_frames = int(os.environ.get("BENCH_FRAMES", "512"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    frames = synthetic_video(n_frames)

    log("bench: building model")
    model = build_usot(mem_size=4)
    ckpt = os.environ.get("BENCH_CKPT")
    if ckpt and os.path.exists(ckpt):
        from usot_tpu.train.checkpoint import load_variables
        variables = load_variables(ckpt)
    else:
        cache = "var/bench_variables.msgpack"
        if os.path.exists(cache):
            from flax import serialization
            variables = init_variables(model, jax.random.PRNGKey(0))
            with open(cache, "rb") as f:
                variables = serialization.from_bytes(variables, f.read())
            log("bench: loaded cached calibrated variables")
        else:
            from usot_tpu.models.calibrate import calibrate_batch_stats
            variables = init_variables(model, jax.random.PRNGKey(0))
            variables = calibrate_batch_stats(model, variables, n_iter=8)
            os.makedirs("var", exist_ok=True)
            from flax import serialization
            with open(cache, "wb") as f:
                f.write(serialization.to_bytes(variables))
    log("bench: variables ready")
    runner = ModelRunner(model, variables)

    p = TrackerConfig()
    p.instance_size = p.small_sz
    p.renew()
    p.sf_size = p.score_size

    engine = ScanEngine(model, variables, p, im_h=frames[0].shape[0],
                        im_w=frames[0].shape[1],
                        max_frames=max(1024, n_frames + 8), chunk=chunk)
    t_init = time.perf_counter()
    state = engine.init_state(frames[0], np.array([200.0, 240.0]),
                              np.array([60.0, 60.0]), runner)
    log(f"bench: video init done in {time.perf_counter() - t_init:.1f}s")

    all_frames = np.stack(frames[1:])
    # Warmup chunk (compile)
    t_c = time.perf_counter()
    state, _, _, _ = engine.track_frames(state, all_frames[:chunk])
    log(f"bench: scan compile+first chunk in {time.perf_counter() - t_c:.1f}s")

    t0 = time.perf_counter()
    state, pos, sz, score = engine.track_frames(state, all_frames[chunk:])
    dt = time.perf_counter() - t0
    n = len(all_frames) - chunk
    fps = n / dt

    assert np.all(np.isfinite(pos)), "non-finite trajectory"
    print(json.dumps({
        "metric": "usot_star_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
