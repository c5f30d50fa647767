"""Hardware A/B of the three depthwise-xcorr formulations at the
engine's hot shapes (VERDICT #3): XLA shift-multiply, grouped conv
(feature_group_count = B*C), and the Pallas VMEM kernel.

Shapes: offline head (B, 29, 29, 256) x (B, 5, 5, 256); memory head
(B*7, 29, 29, 256) x (B*7, 5, 5, 256).

Usage: python tools/bench_xcorr.py [--batch 32] [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.ops.pallas.xcorr_kernel import xcorr_depthwise_pallas
    from usot_tpu.ops.xcorr import (xcorr_depthwise_conv,
                                    xcorr_depthwise_shift)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    N = args.iters
    rng = np.random.default_rng(0)

    def bench(name, fn, x, k):
        def scan_fn(x, k):
            def body(c, _):
                out = fn(x + c.astype(x.dtype), k)
                return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32) * 1e-9, \
                    None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=N)[0]

        jitted = jax.jit(scan_fn)
        try:
            t = time.perf_counter()
            out = jitted(x, k)
            np.asarray(out)
            compile_s = time.perf_counter() - t
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:100]}")
            return
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(jitted(x, k))
            reps.append((time.perf_counter() - t) / N * 1e3)
        print(f"{name:44s} {min(reps):7.3f} ms/iter  "
              f"(compile {compile_s:.0f}s)", flush=True)

    for B, tag in ((args.batch, "offline"), (args.batch * 7, "memory")):
        x = jnp.asarray(rng.normal(size=(B, 29, 29, 256)), dtype)
        k = jnp.asarray(rng.normal(size=(B, 5, 5, 256)), dtype)
        print(f"-- {tag}: x ({B}, 29, 29, 256), k ({B}, 5, 5, 256) --")
        bench(f"shift-multiply [{tag}]", xcorr_depthwise_shift, x, k)
        bench(f"grouped conv B*C={B*256} [{tag}]",
              xcorr_depthwise_conv, x, k)
        bench(f"pallas [{tag}]", xcorr_depthwise_pallas, x, k)


if __name__ == "__main__":
    main()
