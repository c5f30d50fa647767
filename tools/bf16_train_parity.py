"""bf16 vs f32 training loss-trajectory parity (VERDICT r2 #6).

Runs K cycle-memory train steps from the same init on the same fixed
synthetic batches with the model compute dtype at f32 and at bf16
(params stay f32 in both), and reports the loss trajectories + their
divergence. Decision input for making bf16 the training default.

Usage: python tools/bf16_train_parity.py [--steps 40] [--mem-batch 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--mem-batch", type=int, default=8)
    ap.add_argument("--mem-num", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.005)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.train.optim import build_optimizer
    from usot_tpu.train.step import TrainState, make_train_step

    rng = np.random.default_rng(0)
    b = args.mem_batch
    batches = []
    for _ in range(args.steps):
        batches.append({
            "template": rng.normal(scale=40, loc=110, size=(b, 127, 127, 3))
            .astype(np.float32),
            "search": rng.normal(scale=40, loc=110, size=(b, 255, 255, 3))
            .astype(np.float32),
            "label": (rng.random((b, 25, 25)) > 0.8).astype(np.float32),
            "reg_target": (np.abs(rng.normal(size=(b, 25, 25, 4))) * 20 + 5)
            .astype(np.float32),
            "reg_weight": (rng.random((b, 25, 25)) > 0.7).astype(np.float32),
            "template_bbox": np.tile([3.0, 3.0, 11.0, 11.0], (b, 1))
            .astype(np.float32),
            "search_memory": rng.normal(
                scale=40, loc=110, size=(b, args.mem_num, 255, 255, 3))
            .astype(np.float32),
            "search_bbox": np.tile([5.0, 5.0, 19.0, 19.0], (b, 1))
            .astype(np.float32),
        })

    curves = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = build_usot(mem_size=args.mem_num, dtype=dtype)
        variables = init_variables(model, jax.random.PRNGKey(0))
        tx, _ = build_optimizer(variables["params"], momentum=0.9,
                                weight_decay=1e-4, layers_lr_mult=0.1,
                                unfix=True)
        state = TrainState(jax.device_put(variables["params"]),
                           jax.device_put(variables["batch_stats"]),
                           jax.device_put(tx.init(variables["params"])))
        step = make_train_step(model, tx, cycle_memory=True,
                               stage_bn_train=True, lambda_1=0.3)
        losses = []
        for batch in batches:
            state, metrics = step(state, jax.device_put(batch),
                                  jnp.float32(args.lr), jnp.float32(0.5))
            losses.append(float(metrics["loss"]))
        curves[name] = np.asarray(losses)
        print(f"{name}: first {losses[0]:.4f} last {losses[-1]:.4f} "
              f"min {min(losses):.4f}", flush=True)

    d = np.abs(curves["bf16"] - curves["f32"])
    rel = d / np.maximum(np.abs(curves["f32"]), 1e-6)
    both_down = (curves["f32"][-1] < curves["f32"][0]
                 and curves["bf16"][-1] < curves["bf16"][0])
    print(f"steps={args.steps}: |d|_mean={d.mean():.4f} "
          f"|d|_max={d.max():.4f} rel_mean={rel.mean():.3%} "
          f"rel_max={rel.max():.3%} both_decreasing={both_down}")
    print("f32 :", np.array2string(curves['f32'][:10], precision=3))
    print("bf16:", np.array2string(curves['bf16'][:10], precision=3))


if __name__ == "__main__":
    main()
