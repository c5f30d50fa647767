"""Sub-stage timing of the online memory head at engine shapes.

Stages (B=32, M=7 queue, bf16): queue re-encode, cls_x repeat + 3-scale
xcorr, ConfFusion conv+normalize, memory tower. Standalone jnp replicas
with random weights — timing only, the real modules are tested elsewhere.
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
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax import lax

    from usot_tpu.ops.xcorr import xcorr_depthwise_shift

    B = args.batch
    M = 7
    N = args.iters
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def conv(x, w, pad):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    queue = jnp.asarray(rng.normal(size=(B * M, 7, 7, 256)), dt)
    cls_x = [jnp.asarray(rng.normal(size=(B, 29, 29, 256)), dt)
             for _ in range(3)]
    w_enc = [jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, dt)
             for _ in range(3)]
    w_cf = [jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, dt)
            for _ in range(2)]
    w_tow = [jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.05, dt)
             for _ in range(4)]
    dw = jnp.asarray(rng.normal(size=(B * M, 25, 25, 256)), dt)
    zs = [jnp.asarray(rng.normal(size=(B * M, 5, 5, 256)), dt)
          for _ in range(3)]
    fused = jnp.asarray(rng.normal(size=(B, 25, 25, 256)), dt)

    def f_encode(c, q):
        q = q + c.astype(dt)
        outs = [jax.nn.relu(conv(q, w, 0)) for w in w_enc]
        return sum(jnp.sum(o[:, 0, 0, :8]) for o in outs).astype(jnp.float32)

    def f_repeat_xcorr(c, xs, ks):
        acc = 0.0
        for x, k in zip(xs, ks):
            rep = jnp.repeat((x + c.astype(dt))[:, None], M, axis=1) \
                .reshape(B * M, 29, 29, 256)
            acc = acc + xcorr_depthwise_shift(rep, k)
        return jnp.sum(acc[:, 0, 0, :8]).astype(jnp.float32)

    def f_conffusion(c, d):
        d = d + c.astype(dt)
        conf = jnp.clip(jax.nn.relu(conv(d, w_cf[0], 1)), -6.0, 4.0)
        conf = jnp.exp(conf).reshape(B, M, 25, 25, 256)
        conf = conf / jnp.sum(conf, axis=1, keepdims=True)
        value = jax.nn.relu(conv(d, w_cf[1], 1)).reshape(B, M, 25, 25, 256)
        out = jnp.sum(conf * value, axis=1)
        return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

    def f_tower(c, x):
        x = x + c.astype(dt)
        for w in w_tow:
            x = jax.nn.relu(conv(x, w, 1))
        return jnp.sum(x[:, 0, 0, :8]).astype(jnp.float32)

    def run(name, f, *arrs):
        jitted = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (f(c * 1e-9, *a), None), jnp.float32(0.0), None,
            length=N)[0])
        np.asarray(jitted(*arrs))
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(jitted(*arrs))
            reps.append((time.perf_counter() - t) / N * 1e3)
        print(f"{name:36s} {min(reps):7.3f} ms/iter", flush=True)

    from usot_tpu.ops.pallas.xcorr_kernel import xcorr_depthwise_multi_pallas
    from usot_tpu.ops.xcorr import xcorr_depthwise_multi

    zs_bm = [z.reshape(B, M, 5, 5, 256) for z in zs]

    def f_multi_xla(c, xs, ks):
        acc = 0.0
        for x, k in zip(xs, ks):
            out = xcorr_depthwise_multi(x + c.astype(dt), k)
            acc = acc + jnp.sum(out[:, 0, 0, 0, :8])
        return acc.astype(jnp.float32)

    def f_multi_pallas(c, xs, ks):
        acc = 0.0
        for x, k in zip(xs, ks):
            out = xcorr_depthwise_multi_pallas(x + c.astype(dt), k)
            acc = acc + jnp.sum(out[:, 0, 0, 0, :8])
        return acc.astype(jnp.float32)

    from usot_tpu.ops.pallas.xcorr_kernel import xcorr_groupdw_pallas

    xs3 = [jnp.asarray(rng.normal(size=(B, 29, 29, 256)), dt),
           jnp.asarray(rng.normal(size=(B, 27, 29, 256)), dt),
           jnp.asarray(rng.normal(size=(B, 29, 27, 256)), dt)]
    ks3 = [jnp.asarray(rng.normal(size=(B, M, 5, 5, 256)), dt),
           jnp.asarray(rng.normal(size=(B, M, 3, 5, 256)), dt),
           jnp.asarray(rng.normal(size=(B, M, 5, 3, 256)), dt)]
    ks3_1 = [k[:, :1] for k in ks3]

    def f_groupdw_fused(c, xs, ks):
        xs = [x + c.astype(dt) for x in xs]
        out = xcorr_groupdw_pallas(xs, ks)
        return jnp.sum(out[:, 0, 0, 0, :8]).astype(jnp.float32)

    run("queue re-encode (3 convs, B*M)", f_encode, queue)
    run("repeat + 3x xcorr (B*M lanes)", f_repeat_xcorr, cls_x, zs)
    run("3x multi-xcorr broadcast XLA", f_multi_xla, cls_x, zs_bm)
    run("3x multi-xcorr pallas", f_multi_pallas, cls_x, zs_bm)
    run("GroupDW fused pallas (M=7)", f_groupdw_fused, xs3, ks3)
    run("GroupDW fused pallas (M=1)", f_groupdw_fused, xs3, ks3_1)
    run("ConfFusion (2 convs + softmax-ish)", f_conffusion, dw)
    run("memory tower (4 convs, B)", f_tower, fused)


if __name__ == "__main__":
    main()
