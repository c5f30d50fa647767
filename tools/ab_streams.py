"""A/B: tunnel H2D bandwidth, single device_put vs N concurrent streams.

The dev tunnel moves ~20-45 MB/s on one stream (PERF_NOTES round-2
characterization, which also noted "~2x with 4 streams" from an ad-hoc
probe). This tool pins that down at the ROI-streaming block shapes so
the engine can decide whether sharding the per-chunk upload across
threads is worth the added concat. True syncs via dependent tiny D2H
(block_until_ready is a no-op through the tunnel).

Usage: python tools/ab_streams.py [--mb 100] [--streams 1 2 4 8]
"""
import argparse
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def sync(x):
    import jax
    np.asarray(jax.numpy.ravel(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=100.0)
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

    import jax

    # ROI-chunk-like block: (B, T, R, R*3) uint8, B sharded across streams
    B = 32
    nbytes = int(args.mb * 1e6)
    per_lane = nbytes // B
    rr3 = 256 * 3 * 4  # rows of a 256-wide channel-flat window, x4 frames
    rows = max(1, per_lane // rr3)
    buf = np.random.default_rng(0).integers(
        0, 255, (B, rows, rr3), dtype=np.uint8)
    print(f"block: {buf.shape} = {buf.nbytes/1e6:.1f} MB on "
          f"{jax.default_backend()}")

    for mode in ("threads", "seq-async"):
        for ns in args.streams:
            if mode == "seq-async" and ns == 1:
                continue  # identical to threads/1
            if B % ns != 0:
                raise SystemExit(
                    f"--streams {ns} must divide the lane count B={B}")
            shards = np.split(buf, ns, axis=0)
            pool = ThreadPoolExecutor(max_workers=ns) \
                if mode == "threads" else None

            def put_all():
                if pool is not None:
                    return list(pool.map(jax.device_put, shards))
                return [jax.device_put(s) for s in shards]

            # Warmup: sync too, so the first timed rep doesn't pay the
            # ravel/index-gather compile per shard shape, and warm the
            # concat program so cat_ms measures execution, not trace.
            warm = put_all()
            for d in warm:
                sync(d)
            sync(jax.numpy.concatenate(warm, axis=0))
            best = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                devs = put_all()
                for d in devs:
                    sync(d)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            # device-side concat cost (what the engine would pay to
            # reassemble the block before the chunk fn)
            cat_ms = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                cat = jax.numpy.concatenate(devs, axis=0)
                sync(cat)
                dt = (time.perf_counter() - t0) * 1e3
                cat_ms = dt if cat_ms is None else min(cat_ms, dt)
            if pool is not None:
                pool.shutdown()
            rate = buf.nbytes / 1e6 / best
            print(f"{mode}/{ns}: {best:.2f}s = {rate:.1f} MB/s"
                  f"  (+concat {cat_ms:.0f} ms)")


if __name__ == "__main__":
    main()
