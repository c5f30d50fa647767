"""bf16 accuracy drift: scan-engine trajectories f32 vs bf16.

Tracks the same synthetic video with the batched scan engine compiled in
f32 and in bf16 (model compute + carry dtype follow the model dtype) and
reports per-frame center / size deviation — the number VERDICT round 1
asked for before making bf16 the default.

Usage: python tools/measure_bf16_drift.py [--frames 96]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--ckpt",
                    default="var/synth_train/snapshot/checkpoint_e7.ckpt",
                    help="trained checkpoint (random weights make the "
                    "argmax chance-level and the measurement meaningless)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synthetic_video

    from usot_tpu.models.usot import build_usot
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import ScanEngine
    from usot_tpu.tracker.runner import ModelRunner

    frames = synthetic_video(args.frames)
    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = build_usot(mem_size=4, dtype=dtype,
                           fused_xcorr=args.fused)
        if os.path.exists(args.ckpt):
            from usot_tpu.train.checkpoint import load_variables
            variables = load_variables(args.ckpt)
        else:
            from flax import serialization
            with open("var/bench_variables.msgpack", "rb") as f:
                variables = serialization.msgpack_restore(f.read())
        runner = ModelRunner(model, variables)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        engine = ScanEngine(model, variables, p, im_h=480, im_w=640,
                            max_frames=args.frames + 8, chunk=32)
        state = engine.init_state(frames[0], np.array([200.0, 240.0]),
                                  np.array([60.0, 60.0]), runner)
        t0 = time.perf_counter()
        _, pos, sz, score = engine.track_frames(state,
                                                np.stack(frames[1:]))
        print(f"{name}: tracked {len(pos)} frames in "
              f"{time.perf_counter()-t0:.1f}s")
        results[name] = (pos, sz, score)

    p32, s32, c32 = results["f32"]
    p16, s16, c16 = results["bf16"]
    dp = np.linalg.norm(p32 - p16, axis=1)
    ds = np.linalg.norm(s32 - s16, axis=1)
    dc = np.abs(c32 - c16)
    print(f"center deviation px: mean {dp.mean():.3f}  p95 "
          f"{np.percentile(dp, 95):.3f}  max {dp.max():.3f}")
    print(f"size deviation px:   mean {ds.mean():.3f}  p95 "
          f"{np.percentile(ds, 95):.3f}  max {ds.max():.3f}")
    print(f"score deviation:     mean {dc.mean():.4f}  max {dc.max():.4f}")

    # vs ground truth: does bf16 change tracking QUALITY, or only the
    # trajectory's low bits? (synthetic_video target: 200+1.5f, 240+0.7f)
    f = np.arange(1, len(p32) + 1)
    gt = np.stack([200 + np.floor(1.5 * f), 240 + np.floor(0.7 * f)], -1)
    for name, p in (("f32", p32), ("bf16", p16)):
        err = np.linalg.norm(p - gt, axis=1)
        print(f"{name} center error vs GT: mean {err.mean():.3f}  "
              f"p95 {np.percentile(err, 95):.3f}  max {err.max():.3f}")


if __name__ == "__main__":
    main()
