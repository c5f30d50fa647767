"""A/B dilated-conv formulations at the backbone's layer3 shapes.

ResNet layer3 runs at stride 8 with dilation 2 (ref:
lib/models/modules.py:84,104-126); its six blocks' 3x3 dilated 256ch
convs over ~31x31 maps are roughly a third of the backbone's FLOPs, and
the microbench shows the backbone overall at ~42% MXU. Dilated convs
are a classic XLA tiling weak spot; this tool times the same math:

  1. lax.conv_general_dilated with kernel_dilation=(2,2)  (today's path)
  2. space-to-batch: split HxW into 2x2 phases -> (B*4, H/2, W/2, C)
     REGULAR 3x3 conv -> interleave phases back
  3. dilated 9-shift matmul: sum_{dy,dx} shift_2(x) @ W[dy,dx]

plus the layer3 1x1 convs (1024->256, 256->1024) for roofline context.

Usage: python tools/ab_dilated.py [--batch 32] [--hw 31] [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *a, iters=30):
    out = fn(*a)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax_block(out)
    return (time.perf_counter() - t0) / iters, out


def jax_block(x):
    np.asarray(x[0, 0, 0, :1])  # tunnel-safe fence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=31)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    B, S, C = args.batch, args.hw, args.ch
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, C)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dt)

    gflop = B * S * S * 9 * C * C * 2 / 1e9
    peak = 197e3 if args.dtype == "bf16" else 98e3  # v5e GFLOP/s

    @jax.jit
    def conv_dilated(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_s2b(x, w):
        b, h, wd, c = x.shape
        hp, wp = (h + 1) // 2 * 2, (wd + 1) // 2 * 2
        xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
        # (B, H/2, 2, W/2, 2, C) -> (2, 2, B, H/2, W/2, C)
        ph = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
        ph = ph.transpose(2, 4, 0, 1, 3, 5).reshape(4 * b, hp // 2,
                                                    wp // 2, c)
        y = jax.lax.conv_general_dilated(
            ph, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(2, 2, b, hp // 2, wp // 2, c)
        y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, hp, wp, c)
        return y[:, :h, :wd]

    @jax.jit
    def conv_shift(x, w):
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = jnp.zeros((b, h, wd, w.shape[-1]), dt)
        for dy in range(3):
            for dx in range(3):
                win = jax.lax.dynamic_slice(
                    xp, (0, 2 * dy, 2 * dx, 0), (b, h, wd, c))
                acc = acc + win @ w[dy, dx]
        return acc

    print(f"dilated 3x3 {C}ch @ B={B} {S}x{S} ({gflop:.1f} GFLOP)")
    ref = None
    for name, fn in [("conv_dilated", conv_dilated),
                     ("space_to_batch", conv_s2b),
                     ("shift_matmul", conv_shift)]:
        dt_s, out = timeit(fn, x, w, iters=args.iters)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = np.max(np.abs(np.asarray(out, np.float32) - ref))
            assert err < 0.5, (name, err)
        print(f"  {name:16s} {dt_s * 1e3:7.3f} ms  "
              f"{gflop / dt_s / peak * 100:5.1f}% MXU")

    # 1x1 context: the other 2/3 of layer3 FLOPs
    for ci, co in [(1024, 256), (256, 1024)]:
        x1 = jnp.asarray(rng.normal(size=(B, S, S, ci)), dt)
        w1 = jnp.asarray(rng.normal(size=(1, 1, ci, co)) * 0.05, dt)

        @jax.jit
        def conv1(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        g1 = B * S * S * ci * co * 2 / 1e9
        dt_s, _ = timeit(conv1, x1, w1, iters=args.iters)
        print(f"  1x1 {ci}->{co}     {dt_s * 1e3:7.3f} ms  "
              f"{g1 / dt_s / peak * 100:5.1f}% MXU ({g1:.1f} GFLOP)")


if __name__ == "__main__":
    main()
