"""Per-stage microbenchmark of the batched scan-engine frame step.

Each stage runs inside a device-resident lax.scan (xs=None) so the
measurement is per-iteration device cost, free of dispatch/H2D.

Usage: python tools/microbench_step.py [--batch 32] [--iters 20]
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
    ap.add_argument("--max-frames", type=int, default=256)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem (exact rewrite) A/B")
    ap.add_argument("--s2b", action="store_true",
                    help="space-to-batch layer3 dilated convs (exact) A/B")
    ap.add_argument("--mfu", action="store_true",
                    help="per-stage roofline table: XLA-counted FLOPs/"
                         "bytes vs v5e MXU/HBM peaks (PERF_NOTES "
                         "'Inference-step MFU attribution')")
    ap.add_argument("--only-prefix", action="store_true",
                    help="run ONLY the backbone prefix decomposition "
                         "(early-tiling verdict) — each stage costs a "
                         "~2 min remote compile through the dev tunnel, "
                         "so the full battery takes ~45 min; this cut "
                         "fits a short chip window. Implies --mfu.")
    args = ap.parse_args()
    if args.only_prefix:
        args.mfu = True

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.core.crop import subwindow_jax
    from usot_tpu.models.usot import USOTNet, build_usot, init_variables
    from usot_tpu.ops.xcorr import xcorr_depthwise_shift
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import (_assemble_queue_traced,
                                         _memory_write)

    B = args.batch
    N_ITER = args.iters
    MAXF = args.max_frames
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    model = build_usot(mem_size=4, dtype=dtype, s2d_stem=args.s2d,
                       s2b_dilated=args.s2b)
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
    p.sf_size = p.score_size
    S = p.instance_size

    rng = np.random.default_rng(0)
    x_crop = jnp.asarray(rng.normal(size=(B, S, S, 3)), dtype)
    if args.only_prefix:
        # the prefix decomposition touches only x_crop; skip the other
        # operand uploads (~300 MB — mem_feat alone is 205 MB at B=32,
        # several minutes through the dev tunnel)
        frames = avg = hw = pos = xf = zf = queue = None
        mem_feat = mem_conf = mem_idx = mem_len = None
        init_feats = feat = score_b = None
    else:
        frames = jnp.asarray(
            rng.integers(0, 255, (B, 480, 640 * 3), dtype=np.uint8))
        avg = jnp.asarray(rng.uniform(90, 140, (B, 3)), jnp.float32)
        hw = jnp.asarray(np.tile([480.0, 640.0], (B, 1)), jnp.float32)
        pos = jnp.asarray(rng.uniform(100, 300, (B, 2)), jnp.float32)
        xf = jnp.asarray(rng.normal(size=(B, p.score_size + 4,
                                          p.score_size + 4, 256)), dtype)
        zf = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
        queue = jnp.asarray(rng.normal(size=(B, 7, 7, 7, 256)), dtype)
        mem_feat = jnp.asarray(rng.normal(size=(B, MAXF, 7, 7, 256)),
                               dtype)
        mem_conf = jnp.asarray(rng.uniform(0, 1, (B, MAXF)), jnp.float32)
        mem_idx = jnp.asarray(
            np.tile(np.arange(MAXF, dtype=np.int32), (B, 1)))
        mem_len = jnp.full((B,), 40, jnp.int32)
        init_feats = jnp.asarray(rng.normal(size=(B, 2, 7, 7, 256)),
                                 dtype)
        feat = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), dtype)
        score_b = jnp.asarray(rng.uniform(0, 1, (B,)), jnp.float32)

    # Each fn takes (inputs..., carry_scalar) and returns a new scalar so
    # the scan has a loop-carried dependency (prevents hoisting/DCE).
    def f_crop(c):
        pos_t = pos + c  # depend on carry so each iter recomputes
        crop = jax.vmap(lambda im, px, py, av, h: subwindow_jax(
            im, px, py, jnp.float32(255.0) + c, av, S,
            valid_h=h[0], valid_w=h[1], channels=3))
        out = crop(frames, pos_t[:, 0], pos_t[:, 1], avg, hw)
        return jnp.sum(out[:, 0, 0, 0])

    def f_backbone(c):
        x = x_crop + c.astype(dtype)
        out = model.apply(variables, x, method=USOTNet.search_features)
        return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

    def f_offline(c):
        xf_t = xf + c.astype(dtype)
        cls, bbox = model.apply(variables, xf_t, zf,
                                method=USOTNet.track_offline)
        return jnp.sum(cls[:, 0, 0]).astype(jnp.float32)

    def f_memhead(c):
        xf_t = xf + c.astype(dtype)
        cls, bbox, cls_mem = model.apply(
            variables, xf_t, zf, queue,
            method=USOTNet.track_memory_batched)
        return (jnp.sum(cls[:, 0, 0]) + jnp.sum(cls_mem[:, 0, 0])) \
            .astype(jnp.float32)

    def f_queue(c):
        ml = mem_len + c.astype(jnp.int32)
        q = jax.vmap(_assemble_queue_traced, in_axes=(0, 0, 0, 0, 0, None))(
            init_feats, mem_feat, mem_conf, mem_idx, ml, 7)
        return jnp.sum(q[:, 0, 0, 0, :8]).astype(jnp.float32)

    def f_memwrite(c):
        sc = score_b + c
        mf, mc, mi, ml = jax.vmap(_memory_write)(
            mem_feat, mem_conf, mem_idx, mem_len, feat[:, None], sc)
        return jnp.sum(mc) + jnp.sum(mf[:, 0, 0, 0, :8]).astype(jnp.float32)

    def f_pool(c):
        xf_t = xf + c.astype(dtype)
        bb = jnp.tile(jnp.asarray([[2.0, 2.0, 20.0, 20.0]], jnp.float32),
                      (B, 1)) + c
        out = model.apply(variables, xf_t, bb,
                          method=USOTNet.pool_memory_feature)
        return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

    def f_xcorr(c):
        x = xf + c.astype(dtype)
        k = zf + c.astype(dtype)
        out = xcorr_depthwise_shift(x, k)
        return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

    # v5e peaks for the roofline columns (--mfu). MXU bf16 197 TFLOP/s
    # (f32 convs run at half), HBM ~819 GB/s. The depthwise correlation
    # runs on the VPU, whose peak we ESTIMATE at ~4.6 TFLOP/s
    # (consistent with the round-3 '~30% of VPU peak' reading of the
    # row-blocked kernel); its rows are marked est.
    PEAK_MXU = 197e12 if args.dtype == "bf16" else 98.5e12
    PEAK_HBM = 819e9
    PEAK_VPU = 4.6e12
    # XLA's cost model can't see inside a Pallas kernel: analytic FLOPs
    # for the fused 3-scale depthwise correlation (5x5+3x5+5x3 = 55 taps
    # x B x M x 25 x 25 x C FMAs; ops/pallas/xcorr_kernel.py).
    GROUPDW_FLOPS = 2.0 * B * 7 * 256 * 25 * 25 * 55
    mfu_rows = []

    def run(name, f, *args):
        if arg_ns.only_prefix and not name.startswith("backbone prefix"):
            return
        # big operands ride as jit ARGUMENTS (baking them in as closure
        # constants overflows the remote-compile request body)
        jitted = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (f(c * 1e-9, *a), None), jnp.float32(0.0), None,
            length=N_ITER)[0])
        out = jitted(*args)
        np.asarray(out)  # compile + sync
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(jitted(*args))
            reps.append((time.perf_counter() - t) / N_ITER * 1e3)
        ms = min(reps)
        print(f"{name:28s} {ms:8.2f} ms/iter", flush=True)
        if not arg_ns.mfu:
            return
        # roofline: cost-analyze ONE application (the scan reports the
        # body once; a separate single-step compile is unambiguous)
        try:
            ca = jax.jit(lambda *a: f(jnp.float32(0.0), *a)) \
                .lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0) or 0.0)
            hbm = float(ca.get("bytes accessed", 0.0) or 0.0)
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"  cost_analysis unavailable for {name}: {e}")
            return
        vpu_flops = 0.0
        if "groupdw" in name or "FULL STEP" in name:
            vpu_flops = GROUPDW_FLOPS     # invisible to XLA (Pallas)
        t_mxu = flops / PEAK_MXU
        t_vpu = vpu_flops / PEAK_VPU
        t_hbm = hbm / PEAK_HBM
        bound_s = max(t_mxu, t_vpu, t_hbm)
        kind = ("MXU" if bound_s == t_mxu else
                "VPU est" if bound_s == t_vpu else "HBM")
        mfu_rows.append({
            "stage": name.strip(), "ms": round(ms, 2),
            "gflop": round((flops + vpu_flops) / 1e9, 1),
            "gb": round(hbm / 1e9, 2),
            "tflops": round((flops + vpu_flops) / (ms * 1e-3) / 1e12, 1),
            "gbps": round(hbm / (ms * 1e-3) / 1e9, 0),
            "bound_ms": round(bound_s * 1e3, 2),
            "bound": kind,
            "attain_pct": round(100 * bound_s * 1e3 / ms, 1),
        })

    arg_ns = args

    # ---- full frame step, both engine impls, no chunk machinery ----
    from usot_tpu.tracker.engine import BatchScanEngine, EngineState
    if args.only_prefix:
        # the prefix decomposition needs only x_crop + run(); skip the
        # engine/carry setup (2 remote compiles + a few hundred MB of
        # ring uploads through the tunnel)
        _run_prefix_decomposition(args, run, mfu_rows, x_crop, dtype,
                                  S, PEAK_MXU, PEAK_HBM)
        _emit_mfu_table(args, mfu_rows, B)
        return
    engine = BatchScanEngine(model, variables, p, 480, 640, batch=B,
                             max_frames=MAXF, chunk=8)
    sz_b = jnp.full((B, 2), 60.0, jnp.float32)
    # carry holds ENCODED kernels (see EngineState): derive shapes from a
    # real encode pass, fill the rings with random data
    zf_enc = model.apply(variables, zf, method=USOTNet.encode_template)
    fe = model.apply(variables, feat, method=USOTNet.encode_memory_kernels)
    # MAXF + 1: scratch slot for invalid-frame writes
    mem_enc = tuple(jnp.asarray(
        rng.normal(size=(B, MAXF + 1) + tuple(f.shape[1:])), dtype)
        for f in fe)
    init_enc = tuple(jnp.asarray(
        rng.normal(size=(B, 2) + tuple(f.shape[1:])), dtype) for f in fe)
    state = EngineState(pos=pos, sz=sz_b,
                        zf_enc=jax.tree.map(lambda t: t[:, None], zf_enc),
                        init_enc=init_enc, mem_enc=mem_enc,
                        mem_conf=mem_conf, mem_idx=mem_idx, mem_len=mem_len)

    origin_b = jnp.zeros((B, 2), jnp.float32)

    evars = engine.variables  # unfused head (engine built without
    # fused_head); the ENC+FOLDED stage below packs its own fold

    def f_full_native(c, st0):
        st = st0._replace(pos=st0.pos + c)
        new, out = engine._frame_step_batched(evars, avg, hw,
                                              origin_b, st, frames,
                                              jnp.ones((B,), bool))
        return jnp.sum(out[0]) * 1e-9

    vstep = jax.vmap(engine._frame_step,
                     in_axes=(None, 0, 0, 0, 0, 0, 0))
    valid_b = jnp.ones((B,), bool)

    def f_full_vmap(c, st0):
        st = st0._replace(pos=st0.pos + c)
        new, out = vstep(evars, avg, hw, origin_b, st, frames,
                         valid_b)
        return jnp.sum(out[0]) * 1e-9

    # ---- component-level stages of the ENCODED fast path ----
    # (the production engine carries pre-encoded kernels; the stages
    # below attribute its per-frame head cost piece by piece)
    queue_enc = tuple(jnp.asarray(
        rng.normal(size=(B, 7) + tuple(f.shape[1:])), dtype) for f in fe)
    zf_enc1 = jax.tree.map(lambda t: t, zf_enc)  # (B, h, w, C) tensors
    cls_x_real, reg_x_real = model.apply(
        variables, xf, method=lambda m, s: m.connect.encode_search(s))
    dw_maps = jnp.asarray(
        rng.normal(size=(B, 7, p.score_size, p.score_size, 256)), dtype)
    fused_map = jnp.asarray(
        rng.normal(size=(B, p.score_size, p.score_size, 256)), dtype)

    def f_memhead_enc(c):
        xf_t = xf + c.astype(dtype)
        cls, bbox, cls_mem = model.apply(
            variables, xf_t, zf_enc1, queue_enc,
            method=USOTNet.track_memory_encoded_batched)
        return (jnp.sum(cls[:, 0, 0]) + jnp.sum(cls_mem[:, 0, 0])) \
            .astype(jnp.float32)

    from usot_tpu.models.head import fold_inference_head
    fused_pack = jax.device_put(jax.tree.map(
        jnp.asarray, fold_inference_head(variables)))

    def f_memhead_fold(c):
        xf_t = xf + c.astype(dtype)
        cls, bbox, cls_mem = model.apply(
            variables, xf_t, zf_enc1, queue_enc, fused_pack,
            method=USOTNet.track_memory_encoded_fused)
        return (jnp.sum(cls[:, 0, 0]) + jnp.sum(cls_mem[:, 0, 0])) \
            .astype(jnp.float32)

    def f_enc_search(c):
        xf_t = xf + c.astype(dtype)
        cx, rx = model.apply(
            variables, xf_t, method=lambda m, s: m.connect.encode_search(s))
        return (jnp.sum(cx[0][:, 0, 0, :8]) + jnp.sum(rx[0][:, 0, 0, :8])) \
            .astype(jnp.float32)

    def f_groupdw_multi(c):
        cx = [t + c.astype(dtype) for t in cls_x_real]
        qe = [q.reshape((B * 7,) + q.shape[2:]) for q in queue_enc]
        out = model.apply(
            variables, cx, qe,
            method=lambda m, a, b: m.connect.cls_dw.multi(b, a, 7))
        return jnp.sum(out[:, 0, 0, 0, :8]).astype(jnp.float32)

    def f_conf_fusion(c):
        x = dw_maps + c.astype(dtype)
        out = model.apply(
            variables, x,
            method=lambda m, a: m.connect.conf_fusion(a, False))
        return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

    def f_mem_tower(c):
        x = fused_map + c.astype(dtype)
        out = model.apply(
            variables, x,
            method=lambda m, a: m.connect.cls_memory_pred(
                m.connect.cls_memory_tower(a, False)))
        return jnp.sum(out[:, 0, 0]).astype(jnp.float32)

    def f_offline_towers(c):
        x = fused_map + c.astype(dtype)
        out = model.apply(
            variables, x,
            method=lambda m, a: m.connect.cls_pred(m.connect.cls_tower(
                a, False)) + m.connect.bbox_pred(m.connect.bbox_tower(
                    a, False))[..., :1])
        return jnp.sum(out[:, 0, 0]).astype(jnp.float32)

    run("crop (u8 flat->255)", f_crop)
    run("backbone+neck", f_backbone)
    run("offline head", f_offline)
    run("offline+memory head", f_memhead)
    run("ENC offline+memory head", f_memhead_enc)
    run("ENC+FOLDED head", f_memhead_fold)
    run("  encode_search (6 convs)", f_enc_search)
    run("  groupdw multi (fused)", f_groupdw_multi)
    run("  conf_fusion (B*M maps)", f_conf_fusion)
    run("  memory tower+pred", f_mem_tower)
    run("  offline towers+preds", f_offline_towers)
    # production write path: 3 encoded rings, batched formulations
    from usot_tpu.tracker.engine import (_memory_write_multi,
                                         _memory_write_multi_batched)
    feat_enc_w = tuple(f[:, None] for f in fe)          # (B,1,h,w,C)

    def f_memwrite_scatter(c):
        sc = score_b + c
        rs, mc, mi, ml = jax.vmap(_memory_write_multi)(
            mem_enc, mem_conf, mem_idx, mem_len, feat_enc_w, sc, valid_b)
        return (jnp.sum(mc)
                + jnp.sum(rs[0][:, 0, 0, 0, :8]).astype(jnp.float32))

    def f_memwrite_shared(c):
        sc = score_b + c
        rs, mc, mi, ml = _memory_write_multi_batched(
            mem_enc, mem_conf, mem_idx, mem_len, feat_enc_w, sc, valid_b)
        return (jnp.sum(mc)
                + jnp.sum(rs[0][:, 0, 0, 0, :8]).astype(jnp.float32))

    run("queue assembly", f_queue)
    run("memory write", f_memwrite)
    run("memory write ENC (scatter)", f_memwrite_scatter)
    run("memory write ENC (shared)", f_memwrite_shared)
    run("prpool feature", f_pool)
    run("xcorr shift (1 pair 7x7)", f_xcorr)
    run("FULL STEP (native batched)", f_full_native, state)
    run("FULL STEP (vmap)", f_full_vmap, state)

    # ---- chunk-like scans: isolate xs-streaming / valid-select cost ----
    T = 8
    if not args.only_prefix:
        frames_chunk = jnp.asarray(rng.integers(
            0, 255, (T, B, 480, 640 * 3), dtype=np.uint8))
        valid_chunk = jnp.ones((T, B), bool)

    def scan_chunk(with_select):
        def chunk(st0, fr, vd):
            def body(carry, xs):
                frame, is_valid = xs
                new, out = vstep(variables, avg, hw, origin_b, carry,
                                 frame, is_valid)
                if with_select:
                    keep = lambda n, o: jnp.where(
                        is_valid.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
                    new = jax.tree.map(keep, new, carry)
                return new, out
            return jax.lax.scan(body, st0, (fr, vd))
        return chunk

    for name, ws in () if args.only_prefix else (
            ("chunk scan, no select", False),
            ("chunk scan, with select", True)):
        jitted = jax.jit(scan_chunk(ws))
        st2, outs = jitted(state, frames_chunk, valid_chunk)
        np.asarray(outs[0][0, 0])
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            st2, outs = jitted(state, frames_chunk, valid_chunk)
            np.asarray(outs[0][0, 0])
            reps.append((time.perf_counter() - t) / T * 1e3)
        print(f"{name:28s} {min(reps):8.2f} ms/iter", flush=True)

    # ---- the engine's real _chunk_fn, with vs without donation ----
    raw_chunk = None if args.only_prefix else engine._make_chunk_fn()
    for name, jitted, donate in () if args.only_prefix else (
            ("engine chunk_fn, no donate", jax.jit(raw_chunk), False),
            ("engine chunk_fn, donate", jax.jit(raw_chunk,
                                                donate_argnums=(1,)), True)):
        def fresh():
            return jax.tree.map(lambda x: x + 0, state) if donate else state
        st2, outs = jitted(variables, fresh(), frames_chunk, valid_chunk,
                           avg, hw, origin_b)
        np.asarray(outs[0][0, 0])
        reps = []
        for _ in range(3):
            st_in = fresh()
            np.asarray(st_in.pos[0, 0])  # materialize copy outside timing
            t = time.perf_counter()
            st2, outs = jitted(variables, st_in, frames_chunk, valid_chunk,
                               avg, hw, origin_b)
            np.asarray(outs[0][0, 0])
            reps.append((time.perf_counter() - t) / T * 1e3)
        print(f"{name:28s} {min(reps):8.2f} ms/iter", flush=True)

    if args.mfu:
        _run_prefix_decomposition(args, run, mfu_rows, x_crop, dtype, S,
                                  PEAK_MXU, PEAK_HBM)
    _emit_mfu_table(args, mfu_rows, B)


def _run_prefix_decomposition(args, run, mfu_rows, x_crop, dtype, S,
                              PEAK_MXU, PEAK_HBM):
    """Backbone prefix decomposition (early-tiling verdict).

    Timing prefixes (stem, +layer1, +layer2, +layer3) of the SAME
    architecture with random weights (tiling efficiency is
    weight-independent) attributes the backbone's ms/FLOPs/bytes
    per resolution stage: the question is whether the early
    high-resolution stages leave enough absolute ms above their
    roofline bound to justify a hand-written Pallas backbone."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from usot_tpu.models.backbone import (ResNetPlus2, StemConvBN,
                                          _max_pool_3x3_s2_p1)

    class ResNetPrefix(ResNetPlus2):
        n_stages: int = 0

        @nn.compact
        def __call__(self, x):   # mirrors ResNetPlus2.__call__
            x = StemConvBN(dtype=self.dtype, s2d=self.s2d_stem,
                           width=self.width, name="stem")(x, False)
            x = nn.relu(x)
            x = _max_pool_3x3_s2_p1(x)
            w = self.width
            specs = [(w, self.layers[0], 1, 1, "layer1"),
                     (w * 2, self.layers[1], 2, 1, "layer2"),
                     (w * 4, self.layers[2], 1, 2, "layer3")]
            for planes, blocks, stride, dil, nm in \
                    specs[:self.n_stages]:
                x = self._stage(x, planes, blocks, stride, dil, nm,
                                False)
            return x

    for ns, label in ((0, "stem+pool"), (1, "+layer1"),
                      (2, "+layer2"), (3, "+layer3")):
        net = ResNetPrefix(dtype=dtype, n_stages=ns)
        pvars = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, S, S, 3), dtype))

        def f_prefix(c, pv):
            out = net.apply(pv, x_crop + c.astype(dtype))
            return jnp.sum(out[:, 0, 0, :8]).astype(jnp.float32)

        run(f"backbone prefix {label}", f_prefix, pvars)

    # incremental per-stage rows from the 4 cumulative prefixes
    pref = [r for r in mfu_rows if r["stage"].startswith(
        "backbone prefix")]
    for a, b in zip(pref[:-1], pref[1:]):
        dms = b["ms"] - a["ms"]
        if dms <= 0:
            continue
        gflop = b["gflop"] - a["gflop"]
        gb = b["gb"] - a["gb"]
        bound = max(gflop * 1e9 / PEAK_MXU, gb * 1e9 / PEAK_HBM)
        mfu_rows.append({
            "stage": b["stage"].replace("backbone prefix ",
                                        "backbone stage "),
            "ms": round(dms, 2), "gflop": round(gflop, 1),
            "gb": round(gb, 2),
            "tflops": round(gflop / dms / 1e3, 1),
            "gbps": round(gb / dms * 1e3, 0),
            "bound_ms": round(bound * 1e3, 2),
            "bound": "MXU" if gflop * 1e9 / PEAK_MXU
                     >= gb * 1e9 / PEAK_HBM else "HBM",
            "attain_pct": round(100 * bound * 1e3 / dms, 1),
        })


def _emit_mfu_table(args, mfu_rows, B):
    if not (args.mfu and mfu_rows):
        return
    import json
    print("\n### Inference-step MFU attribution "
          f"(B={B}, {args.dtype}, v5e)\n")
    print("| stage | ms | GFLOP | GB | TFLOP/s | GB/s | bound ms "
          "| bound | attainment |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in mfu_rows:
        print(f"| {r['stage']} | {r['ms']} | {r['gflop']} | "
              f"{r['gb']} | {r['tflops']} | {r['gbps']:.0f} | "
              f"{r['bound_ms']} | {r['bound']} | "
              f"{r['attain_pct']}% |")
    os.makedirs("var", exist_ok=True)
    with open("var/mfu_inference.json", "w") as f:
        json.dump({"batch": B, "dtype": args.dtype,
                   "rows": mfu_rows}, f, indent=1)
    print("\nwrote var/mfu_inference.json", flush=True)


if __name__ == "__main__":
    main()
