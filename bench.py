"""Headline benchmark: single-chip USOT* tracking throughput with the
batched on-device scan engine — BENCH_BATCH videos tracked in lockstep,
each frame step doing crop -> backbone -> offline+online heads ->
postprocess -> memory update inside one lax.scan per chunk.

Methodology (round 2): frames are pre-staged into device HBM (uint8,
channel-flat exact-tiling layout) and the steady-state tracking rate is
measured over several repeats, reporting the MEDIAN. Rationale: the
tracker's production host link is PCIe/NIC-class (GB/s — 580 fps of
480x640 video is only 0.5 GB/s), but this dev environment reaches the
chip through a ~25 MB/s tunnel; staging separates chip throughput from
tunnel bandwidth. The tunnel-included streaming figure is also measured
and logged to stderr (set BENCH_MODE=stream to report it as the metric).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Value = aggregate tracked frames/sec on one chip. Baseline: the reference
paper's real-time claim (~58 FPS on a single GPU, arXiv 2108.12711); the
repo publishes no FPS table (ref: scripts/test_usot.py:130-131 only
prints per-video FPS).
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
    """Target bounces on a triangle wave with period 64 — one warmup /
    measurement segment at the default chunking — so every segment
    starts AND ends at the same pose: repeated passes over the same
    frames (the streaming A/B, the staged repeats) keep tracking a
    target the carried state still sees, instead of degenerating into a
    lost-target search (or a spurious ROI replay) after pass 1. Motion
    stays 1.5 px/frame, the drift the ROI sizing budgets for."""
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)

    def tri(f, half_p=32):
        return half_p - abs(f % (2 * half_p) - half_p)

    frames = []
    for f in range(n_frames):
        im = base.copy()
        cx = 200 + int(1.5 * tri(f))
        cy = 240 + int(0.7 * tri(f))
        im[cy - box // 2:cy + box // 2, cx - box // 2:cx + box // 2] = \
            [180, 160, 90]
        frames.append(im)
    return frames


def main():
    import jax

    # Persistent compilation cache: repeated bench runs (and the driver's)
    # skip the 30-300 s remote compiles.
    try:
        jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from usot_tpu.utils.compile_watch import get_watch
    watch = get_watch()   # register before any compile happens

    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import BatchScanEngine
    from usot_tpu.tracker.runner import ModelRunner

    n_frames = int(os.environ.get("BENCH_FRAMES", "129"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    mode = os.environ.get("BENCH_MODE", "staged")
    use_bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
    # Canvas size. The ROI streaming A/B only has room to win when the
    # search window is meaningfully smaller than the frame — at the
    # default 480x640 a trained tracker's grown size-EMA can push the
    # suggested window past the canvas (ROI leg then correctly skips);
    # BENCH_H=720 BENCH_W=960 gives it headroom.
    h = int(os.environ.get("BENCH_H", "480"))
    w = int(os.environ.get("BENCH_W", "640"))
    frames = synthetic_video(n_frames, h=h, w=w)

    log("bench: building model")
    model = build_usot(mem_size=4,
                       dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                       fused_xcorr=jax.default_backend() == "tpu",
                       # exact space-to-batch rewrite of layer3's
                       # dilated convs: isolated backbone+neck 7.69 ->
                       # 7.49 ms at B=32 (tools/ab_backbone_s2b.py,
                       # bit-identical output) but measured NEGATIVE on
                       # the full step (1952.7 -> 1846.6 fps staged
                       # median) — the reshape/transpose phases break
                       # XLA's fusion with the downstream neck crop.
                       # Off by default; BENCH_S2B=1 to re-measure.
                       s2b_dilated=os.environ.get("BENCH_S2B") == "1"
                       and jax.default_backend() == "tpu")
    # Weights: a real checkpoint if one exists (the TRAIN_r05 full
    # 30-epoch run leaves one under var/), else calibrated random
    # weights. The staged fps is weight-independent (same program), but
    # the STREAMING A/B is not: under random weights the tracker loses
    # the synthetic target, the size-EMA collapses, and suggest_roi
    # sizes the window from a degenerate s_x — the r4/early-r5 ROI
    # replays came from that, not from the policy. A trained tracker
    # keeps the trajectory bounded so the ROI leg measures the policy.
    ckpt = os.environ.get("BENCH_CKPT")
    if not ckpt:
        trained = "var/full_schedule/unbroken/snapshot/checkpoint_e30.ckpt"
        if os.path.exists(trained):
            ckpt = trained
            log(f"bench: using trained checkpoint {ckpt}")
    if ckpt and os.path.exists(ckpt):
        from usot_tpu.train.checkpoint import load_variables
        variables = load_variables(ckpt)
    else:
        cache = "var/bench_variables.msgpack"
        if os.path.exists(cache):
            from flax import serialization
            with open(cache, "rb") as f:
                variables = serialization.msgpack_restore(f.read())
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

    engine = BatchScanEngine(model, variables, p,
                             canvas_h=frames[0].shape[0],
                             canvas_w=frames[0].shape[1], batch=batch,
                             max_frames=max(256, n_frames + 8), chunk=chunk)
    videos = [(frames[0], np.array([200.0, 240.0]), np.array([60.0, 60.0]))
              for _ in range(batch)]
    t_init = time.perf_counter()
    with watch.phase("init_batch", log):
        state = engine.init_batch(videos, runner)
    log(f"bench: video init done in {time.perf_counter() - t_init:.1f}s")

    single = np.stack(frames[1:])
    # All lanes track the same video content (identical per-lane work;
    # the engine stores and processes every lane independently).
    all_frames = np.broadcast_to(single[None], (batch,) + single.shape)
    n_each = all_frames.shape[1]
    n_valid = np.full(batch, chunk)

    # Warmup chunk (compile or persistent-cache load; the compile[] line
    # attributes which)
    t_c = time.perf_counter()
    with watch.phase("scan_chunk", log):
        state, _, _, _ = engine.track_batch(state, all_frames[:, :chunk],
                                            n_valid=n_valid)
    log(f"bench: scan compile+first chunk in "
        f"{time.perf_counter() - t_c:.1f}s")

    rest = all_frames[:, chunk:]
    n_rest = rest.shape[1]

    # --- streaming figures (tunnel-included) ---
    # A/B on the SAME frames, same chip session: full-frame streaming
    # first (the ~25 MB/s dev tunnel caps it at ~wire fps), then ROI
    # streaming with an auto-sized exactness-checked window (the
    # structural fix, PERF_NOTES.md "ROI streaming"). BENCH_ROI=0 skips
    # the ROI leg, an integer forces that window size.
    roi_env = os.environ.get("BENCH_ROI", "auto")
    stream_chunk = int(os.environ.get("BENCH_STREAM_CHUNK", "16"))
    t0 = time.perf_counter()
    with watch.phase("fullframe_stream", log):
        state, pos, _, _ = engine.track_batch(
            state, rest, n_valid=np.full(batch, n_rest))
    full_stream_fps = batch * n_rest / (time.perf_counter() - t0)
    log(f"bench: full-frame streaming (tunnel-included): "
        f"{full_stream_fps:.1f} fps")

    roi = engine.suggest_roi(state, chunk=stream_chunk) \
        if roi_env == "auto" else int(roi_env)
    sz_now = np.asarray(state.sz)
    log(f"bench: suggest_roi -> {roi} (canvas {frames[0].shape[1]}x"
        f"{frames[0].shape[0]}, init span {engine._init_span:.0f}, "
        f"live sz max {sz_now.max():.0f})")
    if roi and roi < min(frames[0].shape[:2]):
        t_c = time.perf_counter()
        with watch.phase("roi_chunk", log):
            engine.warm_roi(state, roi, chunk=stream_chunk)
            # the replay path (donating full-frame program at the
            # stream chunk) must not compile inside the timed region
            H, W = frames[0].shape[:2]
            state, _ = engine.run_chunk(
                state, jnp.zeros((stream_chunk, batch, H, W * 3),
                                 jnp.uint8),
                np.zeros((stream_chunk, batch), bool))
        log(f"bench: ROI chunk programs ready in "
            f"{time.perf_counter() - t_c:.1f}s")
        t0 = time.perf_counter()
        state, pos, _, _ = engine.track_batch_roi(
            state, rest, n_valid=np.full(batch, n_rest), roi=roi,
            chunk=stream_chunk)
        stream_fps = batch * n_rest / (time.perf_counter() - t0)
        log(f"bench: ROI-{roi}/chunk-{stream_chunk} streaming "
            f"(tunnel-included): {stream_fps:.1f} fps = "
            f"{stream_fps / full_stream_fps:.2f}x full-frame "
            f"({engine.roi_replays}/{engine.roi_chunks} chunks replayed, "
            f"{engine.roi_escalations} escalations -> roi "
            f"{engine.roi_final}"
            f"{', FELL BACK to full frames' if engine.roi_fallback else ''}"
            f"; sent {engine.roi_bytes_sent / 1e6:.0f}MB vs "
            f"{engine.roi_bytes_full_equiv / 1e6:.0f}MB full-frame)")
    else:
        log("bench: ROI leg skipped — suggested window does not fit "
            "inside the canvas (streaming full frames is the correct "
            "policy there; see engine cost-based fallback)")
        stream_fps = full_stream_fps

    # --- staged steady-state (chip throughput), median of repeats ---
    t0 = time.perf_counter()
    staged = engine.stage_frames(rest, n_valid=np.full(batch, n_rest))
    log(f"bench: staged {batch * n_rest} frames "
        f"({rest.nbytes / 1e6:.0f}MB) in {time.perf_counter() - t0:.1f}s")
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    staged_fps = []
    for r in range(repeats):
        t0 = time.perf_counter()
        if r == 0:
            with watch.phase("staged_program", log):
                state, pos, sz, score = engine.track_staged(state, staged)
        else:
            state, pos, sz, score = engine.track_staged(state, staged)
        dt = time.perf_counter() - t0
        run_fps = batch * n_rest / dt
        staged_fps.append(run_fps)
        log(f"bench: staged repeat {r}: {run_fps:.1f} fps")
    med = float(np.median(staged_fps))
    log(f"bench: staged median {med:.1f} fps, best {max(staged_fps):.1f}, "
        f"min {min(staged_fps):.1f}")
    tot = watch.snapshot()
    log(f"bench: compile totals: {tot['hits']}/{tot['requests']} "
        f"persistent-cache hits ({tot['saved_s']:.0f}s saved, "
        f"{tot['retrieval_s']:.1f}s load), "
        f"{tot['backend_compile_s']:.1f}s cold backend compile")

    assert np.all(np.isfinite(pos)), "non-finite trajectory"
    fps = stream_fps if mode == "stream" else med
    print(json.dumps({
        "metric": "usot_star_tracking_throughput_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
