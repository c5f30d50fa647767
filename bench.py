"""Headline benchmark: single-chip tracking FPS (USOT* full pipeline:
search crop -> backbone -> offline+online heads -> postprocess -> memory
queue update, per frame).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference paper's real-time claim (~58 FPS on a single GPU,
arXiv 2108.12711); the repo itself publishes no FPS table
(ref: scripts/test_usot.py:130-131 only prints per-video FPS).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 58.0


def synthetic_video(n_frames, h=480, w=640, box=60, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 60).astype(np.uint8)
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
    from usot_tpu.tracker.runner import ModelRunner
    from usot_tpu.tracker.tracker import USOTTracker

    n_frames = int(os.environ.get("BENCH_FRAMES", "150"))
    frames = synthetic_video(n_frames)

    model = build_usot(mem_size=4)
    ckpt = os.environ.get("BENCH_CKPT")
    if ckpt and os.path.exists(ckpt):
        from usot_tpu.train.checkpoint import load_variables
        variables = load_variables(ckpt)
    else:
        variables = init_variables(model, jax.random.PRNGKey(0))
    runner = ModelRunner(model, variables)

    tracker = USOTTracker()
    state = tracker.init(frames[0], np.array([200.0, 240.0]),
                         np.array([60.0, 60.0]), runner)

    # Warmup (compile + cache)
    warm = 10
    for im in frames[1:1 + warm]:
        state = tracker.track(state, im)

    t0 = time.perf_counter()
    for im in frames[1 + warm:]:
        state = tracker.track(state, im)
    jax.block_until_ready(state["memory_features"][-1])
    dt = time.perf_counter() - t0
    n = len(frames) - 1 - warm
    fps = n / dt

    print(json.dumps({
        "metric": "usot_star_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
