"""A/B: does XLA:TPU lower s8xs8->s32 convs to the double-rate MXU path?

v5e peak is ~197 bf16 TFLOP/s vs ~394 int8 TOP/s. If int8 convs run
~2x bf16 at our shapes, an int8 inference path is worth building;
if they lower to upcast-and-multiply, it isn't. Device-resident scan
with loop-carried dep + full-tensor mean readouts (the cliff_sweep
measurement rules).

Usage: python tools/ab_int8.py [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # (name, act shape NHWC, kernel HWIO, strides, padding)
    shapes = [
        ("tower25 (B*M=224)", (224, 25, 25, 256), (3, 3, 256, 256),
         (1, 1), [(1, 1), (1, 1)]),
        ("layer2 3x3 (B=32)", (32, 63, 63, 128), (3, 3, 128, 128),
         (1, 1), [(1, 1), (1, 1)]),
        ("layer3 1x1 expand", (32, 31, 31, 256), (1, 1, 256, 1024),
         (1, 1), [(0, 0), (0, 0)]),
        ("layer1 3x3 (B=32)", (32, 63, 63, 64), (3, 3, 64, 64),
         (1, 1), [(1, 1), (1, 1)]),
    ]
    N = args.iters

    def bench(x, w, strides, padding, out_dtype):
        dn = ("NHWC", "HWIO", "NHWC")

        def step(c, _):
            xx = x + c.astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xx, w, strides, padding, dimension_numbers=dn,
                preferred_element_type=out_dtype)
            return jnp.mean(y.astype(jnp.float32)).astype(jnp.int32), None

        f = jax.jit(lambda x, w: jax.lax.scan(
            step, jnp.int32(0), None, length=N)[0])
        np.asarray(f(x, w))
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(f(x, w))
            reps.append((time.perf_counter() - t) / N * 1e3)
        return min(reps)

    print(f"{'shape':22s} {'bf16 ms':>9s} {'int8 ms':>9s} {'ratio':>6s} "
          f"{'bf16 TF/s':>10s} {'int8 TOP/s':>10s}")
    for name, xs, ws, st, pad in shapes:
        flops = 2 * np.prod(xs[:3]) * np.prod(ws)  # approx (ignores pad)
        xb = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=ws), jnp.bfloat16)
        tb = bench(xb, wb, st, pad, jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, ws), jnp.int8)
        ti = bench(xi, wi, st, pad, jnp.int32)
        print(f"{name:22s} {tb:9.3f} {ti:9.3f} {tb / ti:6.2f} "
              f"{flops / tb / 1e9:10.1f} {flops / ti / 1e9:10.1f}",
              flush=True)


if __name__ == "__main__":
    main()
