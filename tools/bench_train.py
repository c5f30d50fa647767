"""Device-only training-step throughput on the chip.

Times the two jitted phases (naive Siamese, cycle-memory) at reference
geometry (template 127, search 255, score 25) with synced readbacks —
the counterpart of the reference's 4x-GPU training envelope
(SURVEY §6: 30 epochs x 50k samples, batch 12/GPU x 4).

Usage: python tools/bench_train.py [--batch 32] [--mem-batch 8]
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
    ap.add_argument("--mem-batch", type=int, default=8)
    ap.add_argument("--mem-num", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (params stay f32)")
    ap.add_argument("--shards", default=None,
                    help="ALSO measure end-to-end throughput streaming "
                    "this shard dir (built on demand with synthetic "
                    "data if missing) through device_put + step")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches (HBM-for-"
                    "throughput trade; see train/step.py)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized backward (jax.checkpoint)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.models.usot import USOTNet, build_usot, init_variables
    from usot_tpu.train.optim import build_optimizer
    from usot_tpu.train.step import TrainState, make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_usot(mem_size=args.mem_num, dtype=dtype)
    variables = init_variables(model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(variables["params"], momentum=0.9,
                            weight_decay=1e-4, layers_lr_mult=0.1,
                            unfix=True)
    state = TrainState(jax.device_put(variables["params"]),
                       jax.device_put(variables["batch_stats"]),
                       jax.device_put(tx.init(variables["params"])))

    rng = np.random.default_rng(0)

    def make_batch(b, mem):
        batch = {
            "template": rng.normal(size=(b, 127, 127, 3)).astype(np.float32),
            "search": rng.normal(size=(b, 255, 255, 3)).astype(np.float32),
            "label": (rng.random((b, 25, 25)) > 0.8).astype(np.float32),
            "reg_target": np.abs(rng.normal(
                size=(b, 25, 25, 4)).astype(np.float32)) + 1.0,
            "reg_weight": (rng.random((b, 25, 25)) > 0.7).astype(np.float32),
            "template_bbox": np.tile([3.0, 3.0, 11.0, 11.0], (b, 1))
            .astype(np.float32),
        }
        if mem:
            batch["search_memory"] = rng.normal(
                size=(b, args.mem_num, 255, 255, 3)).astype(np.float32)
            batch["search_bbox"] = np.tile([5.0, 5.0, 19.0, 19.0], (b, 1)) \
                .astype(np.float32)
        return jax.device_put(batch)

    for name, cyc, b in (("naive", False, args.batch),
                         ("cycle-memory", True, args.mem_batch)):
        step = make_train_step(model, tx, cycle_memory=cyc,
                               stage_bn_train=True, lambda_1=0.3,
                               remat=args.remat, accum_steps=args.accum)
        batch = make_batch(b, cyc)
        st = state
        t = time.perf_counter()
        st, metrics = step(st, batch, jnp.float32(0.005), jnp.float32(0.5))
        loss = float(metrics["loss"])
        print(f"{name}: compile+first step {time.perf_counter()-t:.1f}s "
              f"(loss {loss:.3f})", flush=True)
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(args.iters):
                st, metrics = step(st, batch, jnp.float32(0.005),
                                   jnp.float32(0.5))
            float(metrics["loss"])
            reps.append((time.perf_counter() - t) / args.iters)
        sec = min(reps)
        print(f"{name}: batch {b}: {sec*1e3:.1f} ms/step = "
              f"{b/sec:.1f} samples/s "
              f"(epoch of 50k samples: {50000*sec/b/60:.1f} min)",
              flush=True)
        # MFU attribution: XLA's own flop count for the compiled step
        # against the v5e bf16 MXU peak (197 TFLOP/s). f32 runs are
        # still reported against the bf16 peak (labelled) so the two
        # modes are comparable on one scale.
        try:
            ca = step.lower(st, batch, jnp.float32(0.005),
                            jnp.float32(0.5)).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception as e:  # cost analysis is best-effort per backend
            print(f"{name}: cost_analysis unavailable: {e}")
            flops = 0.0
        if flops > 0:
            peak = 197e12
            print(f"{name}: XLA-counted {flops/1e12:.2f} TFLOP/step -> "
                  f"{flops/sec/1e12:.1f} TFLOP/s = "
                  f"{100*flops/sec/peak:.1f}% of bf16 MXU peak",
                  flush=True)
        if cyc:
            device_only_mem = b / sec

    if args.shards:
        end_to_end_shards(args, model, tx, state, device_only_mem)


def make_synthetic_shards(out_dir, n_samples, mem_num, shard_size=64):
    """Synthetic cycle-memory shards in the transport schema
    (channel-flat uint8 images; see data/shards.py) — enough to measure
    the streaming path without a crop511 dataset on disk."""
    import json

    rng = np.random.default_rng(0)
    os.makedirs(out_dir, exist_ok=True)
    written = sid = 0
    while written < n_samples:
        n = min(shard_size, n_samples - written)
        arrays = {
            "template": rng.integers(0, 255, (n, 127, 127 * 3), np.uint8),
            "search": rng.integers(0, 255, (n, 255, 255 * 3), np.uint8),
            "search_memory": rng.integers(
                0, 255, (n, mem_num, 255, 255 * 3), np.uint8),
            "label": (rng.random((n, 25, 25)) > 0.8).astype(np.float32),
            "reg_target": (np.abs(rng.normal(size=(n, 25, 25, 4))) + 1.0)
            .astype(np.float32),
            "reg_weight": (rng.random((n, 25, 25)) > 0.7)
            .astype(np.float32),
            "template_bbox": np.tile([3.0, 3.0, 11.0, 11.0],
                                     (n, 1)).astype(np.float32),
            "search_bbox": np.tile([5.0, 5.0, 19.0, 19.0],
                                   (n, 1)).astype(np.float32),
        }
        np.savez(os.path.join(out_dir, f"shard_{sid:05d}.npz"), **arrays)
        written += n
        sid += 1
    meta = {"n_samples": n_samples, "shard_size": shard_size,
            "cycle_memory": True, "seed": 0, "n_shards": sid,
            "keys": sorted(arrays)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def end_to_end_shards(args, model, tx, state, device_only_mem):
    """Measure disk -> device_put -> step samples/s on the cycle-memory
    phase: the VERDICT r2 #3 target is within ~20% of device-only."""
    import time

    import jax
    import jax.numpy as jnp

    from usot_tpu.data.shards import (ShardLoader, device_prefetch,
                                      read_meta)
    from usot_tpu.train.step import make_train_step

    b = args.mem_batch
    if read_meta(args.shards) is None:
        n = max(4 * b, 4 * b * ((args.iters + 3) // 4))
        print(f"building synthetic shards ({n} samples) in {args.shards}",
              flush=True)
        make_synthetic_shards(args.shards, n, args.mem_num,
                              shard_size=2 * b)

    step = make_train_step(model, tx, cycle_memory=True,
                           stage_bn_train=True, lambda_1=0.3)
    loader = ShardLoader(args.shards, b)
    # warm the compile outside the timed epoch
    first = next(iter(loader))
    st, metrics = step(state, jax.device_put(first),
                       jnp.float32(0.005), jnp.float32(0.5))
    float(metrics["loss"])

    n_steps = 0
    t = time.perf_counter()
    for batch in device_prefetch(loader):
        st, metrics = step(st, batch,
                           jnp.float32(0.005), jnp.float32(0.5))
        n_steps += 1
    float(metrics["loss"])  # sync
    wall = time.perf_counter() - t
    rate = n_steps * b / wall
    print(f"end-to-end shards: {n_steps} steps of {b} in {wall:.1f}s = "
          f"{rate:.1f} samples/s "
          f"({100 * rate / device_only_mem:.0f}% of device-only "
          f"{device_only_mem:.1f}/s)", flush=True)


if __name__ == "__main__":
    main()
