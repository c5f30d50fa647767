"""A/B conv formulations for the head's hot shape class.

The offline/memory towers and ConfFusion are stacks of 3x3 pad-1
256->256 convs over ~25x25 maps (B=32 or B*M=224 items). The microbench
shows them running far below MXU roofline; this tool times the same
math three ways on the device:

  1. lax.conv_general_dilated (what flax nn.Conv emits today)
  2. 9-shift matmul: sum_{dy,dx} shift(x) @ W[dy,dx]  (K=N=256 GEMMs)
  3. im2col + one big GEMM (K=2304)

Usage: python tools/ab_conv25.py [--items 224] [--hw 25] [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=224)
    ap.add_argument("--hw", type=int, default=25)
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    B, S, CI, CO = args.items, args.hw, args.cin, args.cout
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, CI)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, CI, CO)) * 0.05, dt)

    gflop = B * S * S * 9 * CI * CO * 2 / 1e9

    def conv_xla(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_shift(x, w):
        # pad once, slice 9 views, each contracted as a GEMM on CI
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                v = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (B, S, S, CI))
                t = jnp.einsum("bhwc,co->bhwo", v, w[dy, dx],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return out.astype(x.dtype)

    def conv_im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, S, S, CI))
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)      # (B,S,S,9*CI)
        return jnp.einsum("bhwk,ko->bhwo", patches,
                          w.reshape(9 * CI, CO),
                          preferred_element_type=jnp.float32).astype(x.dtype)

    # correctness cross-check (loose: bf16 accumulate differences)
    ref = np.asarray(conv_xla(x, w), np.float32)
    for name, f in (("shift", conv_shift), ("im2col", conv_im2col)):
        got = np.asarray(f(x, w), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        print(f"check {name}: rel max err {err:.2e}", flush=True)

    def bench(name, f):
        jitted = jax.jit(lambda x, w: jax.lax.scan(
            lambda c, _: (c + jnp.sum(f(x + c.astype(x.dtype), w)[0, 0, 0, :8]
                                      ).astype(jnp.float32) * 1e-12, None),
            jnp.float32(0.0), None, length=args.iters)[0])
        np.asarray(jitted(x, w))
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(jitted(x, w))
            reps.append((time.perf_counter() - t) / args.iters * 1e3)
        ms = min(reps)
        print(f"{name:10s} {ms:7.2f} ms  {gflop / ms * 1e3:7.1f} GFLOP/s",
              flush=True)

    print(f"shape: ({B},{S},{S},{CI})->{CO}, {gflop:.1f} GFLOP/conv")
    bench("conv_xla", conv_xla)
    bench("shift", conv_shift)
    bench("im2col", conv_im2col)


if __name__ == "__main__":
    main()
