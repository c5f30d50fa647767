"""Root-cause sweep for the B>32 per-step cliff (VERDICT r3 #5).

The full vmap frame step scales superlinearly past B=32
(24.3 ms at B=32 -> 43.4 at B=48, a 1.79x jump for 1.5x work,
PERF_NOTES.md "Measured after the fixes"). This tool times ONLY the
suspect stages at one batch size per invocation (so a tunnel flake or
the 900 s battery timeout can't truncate a whole sweep) and prints
XLA's own cost analysis (flops + bytes accessed) for each compiled
stage: a superlinear jump in *bytes accessed* at fixed per-sample
flops is a layout/padding cliff, not a FLOP problem.

Readouts are FULL-TENSOR means: a sliced readout (out[:, 0, 0, :8])
lets XLA dead-code-eliminate whole convs and spatially narrow the
shift-formulation correlations (measured: it dropped 2 of 3 encoder
scales from enc_search). Big operands ride as jit ARGUMENTS (baking them into the closure
overflows the remote-compile request body — same constraint as
tools/microbench_step.py).

Usage:
  python tools/cliff_sweep.py --batch 48 [--stages full,memhead,conf]
  python tools/cliff_sweep.py --batch 48 --stages memhead --hlo /tmp/hlo48
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_STAGES = ("full", "memhead", "enc_search", "xcorr_pair", "groupdw",
              "conf", "towers", "backbone")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default=",".join(ALL_STAGES))
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--hlo", default=None,
                    help="dump optimized HLO text per stage into this dir")
    args = ap.parse_args()
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]

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
    S = p.instance_size

    rng = np.random.default_rng(0)
    x_crop = jnp.asarray(rng.normal(size=(B, S, S, 3)), dtype)
    xf = jnp.asarray(rng.normal(size=(B, p.score_size + 4, p.score_size + 4,
                                      256)), dtype)
    zf = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
    feat = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
    dw_maps = jnp.asarray(
        rng.normal(size=(B, 7, p.score_size, p.score_size, 256)), dtype)
    fused_map = jnp.asarray(
        rng.normal(size=(B, p.score_size, p.score_size, 256)), dtype)

    zf_enc = model.apply(variables, zf, method=USOTNet.encode_template)
    fe = model.apply(variables, feat, method=USOTNet.encode_memory_kernels)
    queue_enc = tuple(jnp.asarray(
        rng.normal(size=(B, 7) + tuple(f.shape[1:])), dtype) for f in fe)
    cls_x_real, _ = model.apply(
        variables, xf, method=lambda m, s: m.connect.encode_search(s))

    # name -> (fn(c, *ops), ops_tuple)
    fns = {}

    def f_memhead(c, xf, zf_enc, queue_enc):
        xf_t = xf + c.astype(dtype)
        cls, bbox, cls_mem = model.apply(
            variables, xf_t, zf_enc, queue_enc,
            method=USOTNet.track_memory_encoded_batched)
        return (jnp.mean(cls) + jnp.mean(cls_mem)
                + jnp.mean(bbox)).astype(jnp.float32)
    fns["memhead"] = (f_memhead, (xf, zf_enc, queue_enc))

    def f_enc_search(c, xf):
        xf_t = xf + c.astype(dtype)
        cx, rx = model.apply(
            variables, xf_t, method=lambda m, s: m.connect.encode_search(s))
        return sum(jnp.mean(t.astype(jnp.float32))
                   for t in cx + rx).astype(jnp.float32)
    fns["enc_search"] = (f_enc_search, (xf,))

    def f_xcorr_pair(c, cls_x_real, zf_enc):
        # the offline template correlations: cls_dw + reg_dw, each a
        # 3-scale softmax-weighted depthwise xcorr against ONE kernel
        # (M=1 route through the same fused kernel as .multi)
        cx = [t + c.astype(dtype) for t in cls_x_real]
        out = model.apply(
            variables, list(zf_enc[0]), cx,
            method=lambda m, z, x: m.connect.cls_dw(z, x))
        return jnp.mean(out.astype(jnp.float32)).astype(jnp.float32)
    fns["xcorr_pair"] = (f_xcorr_pair, (cls_x_real, zf_enc))

    def f_groupdw(c, cls_x_real, queue_enc):
        cx = [t + c.astype(dtype) for t in cls_x_real]
        qe = [q.reshape((B * 7,) + q.shape[2:]) for q in queue_enc]
        out = model.apply(
            variables, cx, qe,
            method=lambda m, a, b: m.connect.cls_dw.multi(b, a, 7))
        return jnp.mean(out.astype(jnp.float32)).astype(jnp.float32)
    fns["groupdw"] = (f_groupdw, (cls_x_real, queue_enc))

    def f_conf(c, dw_maps):
        x = dw_maps + c.astype(dtype)
        out = model.apply(
            variables, x,
            method=lambda m, a: m.connect.conf_fusion(a, False))
        return jnp.mean(out.astype(jnp.float32)).astype(jnp.float32)
    fns["conf"] = (f_conf, (dw_maps,))

    def f_towers(c, fused_map):
        x = fused_map + c.astype(dtype)
        out = model.apply(
            variables, x,
            method=lambda m, a: m.connect.cls_pred(m.connect.cls_tower(
                a, False)) + m.connect.bbox_pred(m.connect.bbox_tower(
                    a, False))[..., :1]
            + m.connect.cls_memory_pred(m.connect.cls_memory_tower(a, False)))
        return jnp.mean(out).astype(jnp.float32)
    fns["towers"] = (f_towers, (fused_map,))

    def f_backbone(c, x_crop):
        x = x_crop + c.astype(dtype)
        out = model.apply(variables, x, method=USOTNet.search_features)
        return jnp.mean(out).astype(jnp.float32)
    fns["backbone"] = (f_backbone, (x_crop,))

    if "full" in stages:
        from usot_tpu.tracker.engine import BatchScanEngine, EngineState
        MAXF = 256
        engine = BatchScanEngine(model, variables, p, 480, 640, batch=B,
                                 max_frames=MAXF, chunk=8)
        frames = jnp.asarray(
            rng.integers(0, 255, (B, 480, 640 * 3), dtype=np.uint8))
        avg = jnp.asarray(rng.uniform(90, 140, (B, 3)), jnp.float32)
        hw = jnp.asarray(np.tile([480.0, 640.0], (B, 1)), jnp.float32)
        pos = jnp.asarray(rng.uniform(100, 300, (B, 2)), jnp.float32)
        sz_b = jnp.full((B, 2), 60.0, jnp.float32)
        mem_enc = tuple(jnp.asarray(
            rng.normal(size=(B, MAXF + 1) + tuple(f.shape[1:])), dtype)
            for f in fe)
        init_enc = tuple(jnp.asarray(
            rng.normal(size=(B, 2) + tuple(f.shape[1:])), dtype) for f in fe)
        mem_conf = jnp.asarray(rng.uniform(0, 1, (B, MAXF)), jnp.float32)
        mem_idx = jnp.asarray(
            np.tile(np.arange(MAXF, dtype=np.int32), (B, 1)))
        state = EngineState(
            pos=pos, sz=sz_b,
            zf_enc=jax.tree.map(lambda t: t[:, None], zf_enc),
            init_enc=init_enc, mem_enc=mem_enc, mem_conf=mem_conf,
            mem_idx=mem_idx, mem_len=jnp.full((B,), 40, jnp.int32))
        origin_b = jnp.zeros((B, 2), jnp.float32)
        valid_b = jnp.ones((B,), bool)
        vstep = jax.vmap(engine._frame_step,
                         in_axes=(None, 0, 0, 0, 0, 0, 0))

        def f_full(c, state, frames, avg, hw, origin_b, valid_b):
            st = state._replace(pos=state.pos + c)
            new, out = vstep(engine.variables, avg, hw, origin_b, st,
                             frames, valid_b)
            return jnp.sum(out[0]) * 1e-9
        fns["full"] = (f_full, (state, frames, avg, hw, origin_b, valid_b))

    for name in stages:
        f, ops = fns[name]

        def scanned(c0, *a, _f=f):
            return jax.lax.scan(
                lambda c, _: (_f(c * 1e-9, *a), None), c0, None,
                length=N_ITER)[0]
        jitted = jax.jit(scanned)
        compiled = jitted.lower(jnp.float32(0.0), *ops).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) / N_ITER
            nbytes = float(ca.get("bytes accessed", 0.0)) / N_ITER
        except Exception:
            flops = nbytes = 0.0
        if args.hlo:
            os.makedirs(args.hlo, exist_ok=True)
            with open(os.path.join(args.hlo, f"{name}_B{B}.txt"), "w") as fh:
                fh.write(compiled.as_text())
        out = compiled(jnp.float32(0.0), *ops)
        np.asarray(out)
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(compiled(jnp.float32(0.0), *ops))
            reps.append((time.perf_counter() - t) / N_ITER * 1e3)
        ms = min(reps)
        print(f"B={B} {name:12s} {ms:8.2f} ms/iter  "
              f"{flops/1e9:8.2f} GFLOP/iter  {nbytes/1e6:8.1f} MB/iter  "
              f"({flops/B/1e6:.1f} MF/sample, {nbytes/B/1e3:.1f} kB/sample)",
              flush=True)


if __name__ == "__main__":
    main()
