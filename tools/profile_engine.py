"""Breakdown profiler for the batched scan engine on the real chip.

Answers: where do the chunk-seconds go — host prep (1-core numpy),
H2D through the tunnel, or device compute? Run on a quiet host.

Usage: python tools/profile_engine.py [--batch 16] [--chunk 32]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--skip-engine", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=256)
    ap.add_argument("--impl", default="vmap", choices=["vmap", "native"])
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas GroupDW correlation in the heads")
    args = ap.parse_args()

    t0 = time.perf_counter()
    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    devs = jax.devices()
    print(f"backend init: {time.perf_counter()-t0:.1f}s  devices={devs}")

    B, CK = args.batch, args.chunk
    big = np.random.randint(0, 255, (CK, B, 480, 640, 3), dtype=np.uint8)
    if args.skip_probe:
        return run_engine(args, big)
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    f(x).block_until_ready()
    rtts = []
    for _ in range(5):
        t = time.perf_counter()
        f(x).block_until_ready()
        rtts.append(time.perf_counter() - t)
    print("trivial dispatch RTT:", " ".join(f"{t*1e3:.0f}ms" for t in rtts))

    for i in range(3):
        t = time.perf_counter()
        d = jax.device_put(big)
        d.block_until_ready()
        dt = time.perf_counter() - t
        print(f"H2D {big.nbytes/1e6:.0f}MB (try {i}): {dt:.2f}s "
              f"= {big.nbytes/dt/1e6:.0f} MB/s")
    # small D2H
    t = time.perf_counter()
    np.asarray(f(x))
    print(f"D2H small: {time.perf_counter()-t:.3f}s")
    if args.skip_engine:
        return
    run_engine(args, big)


def run_engine(args, big):
    import jax
    import jax.numpy as jnp
    B, CK = args.batch, args.chunk
    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import BatchScanEngine
    from usot_tpu.tracker.runner import ModelRunner

    use_bf16 = args.dtype == "bf16"
    model = build_usot(mem_size=4,
                       dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                       fused_xcorr=args.fused)
    import os
    cache = "var/bench_variables.msgpack"
    if os.path.exists(cache):
        from flax import serialization
        with open(cache, "rb") as fh:
            variables = serialization.msgpack_restore(fh.read())
    else:
        variables = init_variables(model, jax.random.PRNGKey(0))
    runner = ModelRunner(model, variables)

    p = TrackerConfig()
    p.instance_size = p.small_sz
    p.renew()
    p.sf_size = p.score_size

    engine = BatchScanEngine(model, variables, p, canvas_h=480, canvas_w=640,
                             batch=B, max_frames=args.max_frames, chunk=CK,
                             unroll=args.unroll, impl=args.impl)
    frames0 = big[0, 0]
    videos = [(frames0, np.array([200.0, 240.0]), np.array([60.0, 60.0]))
              for _ in range(B)]
    t = time.perf_counter()
    state = engine.init_batch(videos, runner)
    jax.block_until_ready(state)
    print(f"init_batch: {time.perf_counter()-t:.1f}s")

    avg = engine._avg_b
    hw = engine._im_hw_b
    valid = jnp.ones((CK, B), bool)
    origin = jnp.zeros((B, 2), jnp.float32)

    def sync(tree):
        # block_until_ready is a no-op through this tunnel runtime; a
        # dependent tiny D2H is the only true sync.
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.numpy.ravel(leaf)[0])

    # compile (upload first, sync, so compile timing excludes H2D)
    t = time.perf_counter()
    block_dev = jax.device_put(big.reshape(big.shape[:3] + (-1,)))
    sync(block_dev)
    print(f"chunk H2D flat ({big.nbytes/1e6:.0f}MB): "
          f"{time.perf_counter()-t:.2f}s")
    t = time.perf_counter()
    state2, outs = engine._chunk_fn(engine.variables, state, block_dev,
                                    valid, avg, hw, origin)
    sync(outs)
    print(f"chunk compile+run: {time.perf_counter()-t:.1f}s")

    # pure device compute (input already resident)
    for i in range(3):
        t = time.perf_counter()
        state2, outs = engine._chunk_fn(engine.variables, state2, block_dev,
                                        valid, avg, hw, origin)
        sync(outs)
        dt = time.perf_counter() - t
        print(f"chunk device-only (try {i}): {dt:.2f}s "
              f"= {B*CK/dt:.1f} fps = {dt/CK*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
