"""Composition bisect for the B>32 cliff (companion to cliff_sweep.py).

Readouts are FULL-TENSOR means: a sliced readout (e.g. out[:, 0, 0, :8])
lets XLA dead-code-eliminate whole convs and spatially narrow the
shift-formulation correlations, silently shrinking the measured work
(first run of this tool measured chain B *faster* than its prefix A
that way).

cliff_sweep showed: every ISOLATED stage of the memory head scales
linearly-or-better with batch, XLA-counted flops/bytes per sample are
constant, yet the COMPOSED head goes 22.0 -> 51.0 ms from B=32 to B=64
(2.32x for 2x work). The superlinearity must enter between stages.
This tool times incrementally longer chains of the same head so the
jump localizes to one composition step:

  A  enc_search                  (6 encoder convs)
  B  A + cls_dw + reg_dw         (offline template correlations)
  C  B + towers + preds          (= full offline_preenc)
  D  C + groupdw multi           (memory correlations, Pallas)
  E  D + conf_fusion + mem tower (= full memory head)
  F  E with fused_xcorr=True     (production Pallas pair-xcorr too)

Usage: python tools/cliff_bisect.py --batch 64 [--chains A,B,C,D,E,F]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chains", default="A,B,C,D,E,F")
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    chains = [s.strip().upper() for s in args.chains.split(",") if s.strip()]

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.models.usot import USOTNet, build_usot, init_variables
    from usot_tpu.tracker.config import TrackerConfig

    B = args.batch
    N_ITER = args.iters
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    model = build_usot(mem_size=4, dtype=dtype)
    model_fused = model.clone(fused_xcorr=True)
    cache = "var/bench_variables.msgpack"
    if os.path.exists(cache):
        from flax import serialization
        with open(cache, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
    else:
        variables = init_variables(model, jax.random.PRNGKey(0))

    p = TrackerConfig()
    p.instance_size = p.small_sz
    p.renew()

    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(B, p.score_size + 4, p.score_size + 4,
                                      256)), dtype)
    zf = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
    feat = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
    zf_enc = model.apply(variables, zf, method=USOTNet.encode_template)
    fe = model.apply(variables, feat, method=USOTNet.encode_memory_kernels)
    queue_enc = tuple(jnp.asarray(
        rng.normal(size=(B, 7) + tuple(f.shape[1:])), dtype) for f in fe)

    def chain_A(m, xf_t, zf_enc, queue_enc):
        cx = m.connect.cls_encode_s(xf_t, False)
        rx = m.connect.reg_encode_s(xf_t, False)
        return sum(jnp.mean(t.astype(jnp.float32)) for t in cx + rx)

    def chain_B(m, xf_t, zf_enc, queue_enc):
        cx = m.connect.cls_encode_s(xf_t, False)
        rx = m.connect.reg_encode_s(xf_t, False)
        cls_dw = m.connect.cls_dw(list(zf_enc[0]), cx)
        reg_dw = m.connect.reg_dw(list(zf_enc[1]), rx)
        return (jnp.mean(cls_dw.astype(jnp.float32))
                + jnp.mean(reg_dw.astype(jnp.float32)))

    def chain_C(m, xf_t, zf_enc, queue_enc):
        bbox, cls, cls_x, _ = m.connect.offline_preenc(
            xf_t, list(zf_enc[0]), list(zf_enc[1]))
        return jnp.mean(cls) + jnp.mean(bbox)

    def chain_D(m, xf_t, zf_enc, queue_enc):
        bbox, cls, cls_x, _ = m.connect.offline_preenc(
            xf_t, list(zf_enc[0]), list(zf_enc[1]))
        b, n_q = queue_enc[0].shape[0], queue_enc[0].shape[1]
        flat = [q.reshape((b * n_q,) + q.shape[2:]) for q in queue_enc]
        ks = [k.reshape((b, n_q) + k.shape[1:]) for k in flat]
        dw = m.connect.cls_dw.multi(flat, cls_x, n_q)
        return (jnp.mean(cls) + jnp.mean(bbox)
                + jnp.mean(dw.astype(jnp.float32)))

    def chain_E(m, xf_t, zf_enc, queue_enc):
        cls, bbox, cls_mem = m.track_memory_encoded_batched(
            xf_t, zf_enc, queue_enc)
        return jnp.mean(cls) + jnp.mean(cls_mem) + jnp.mean(bbox)

    chain_fns = {"A": (model, chain_A), "B": (model, chain_B),
                 "C": (model, chain_C), "D": (model, chain_D),
                 "E": (model, chain_E), "F": (model_fused, chain_E)}

    for name in chains:
        m, f = chain_fns[name]

        def stage(c, xf, zf_enc, queue_enc, _m=m, _f=f):
            xf_t = xf + c.astype(dtype)
            out = _m.apply(variables, xf_t, zf_enc, queue_enc,
                           method=lambda mm, a, b2, c2: _f(mm, a, b2, c2))
            return out.astype(jnp.float32)

        def scanned(c0, *a, _s=stage):
            return jax.lax.scan(
                lambda c, _: (_s(c * 1e-9, *a), None), c0, None,
                length=N_ITER)[0]
        compiled = jax.jit(scanned).lower(
            jnp.float32(0.0), xf, zf_enc, queue_enc).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) / N_ITER
            nbytes = float(ca.get("bytes accessed", 0.0)) / N_ITER
        except Exception:
            flops = nbytes = 0.0
        out = compiled(jnp.float32(0.0), xf, zf_enc, queue_enc)
        np.asarray(out)
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(compiled(jnp.float32(0.0), xf, zf_enc, queue_enc))
            reps.append((time.perf_counter() - t) / N_ITER * 1e3)
        print(f"B={B} chain {name}   {min(reps):8.2f} ms/iter  "
              f"{flops/1e9:8.2f} GFLOP/iter  {nbytes/1e6:8.1f} MB/iter",
              flush=True)


if __name__ == "__main__":
    main()
