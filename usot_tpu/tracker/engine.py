"""Scan tracking engine: the whole per-frame step — crop, backbone, heads,
memory queue, postprocess — lives on device inside a lax.scan, so a video
is tracked in a handful of dispatches (frames stream HBM-resident).

This is the TPU-native answer to the reference's per-frame host/device
ping-pong (ref: lib/tracker/usot_tracker.py track(): NumPy crop + CUDA
forward + NumPy penalties every frame). Functional carry:

  pos, sz, zf, init feature anchors, memory ring buffer + confidences,
  memory length — all static shapes (SURVEY §5.7's bounded-state design).

Chunked: frames are uploaded in fixed-size uint8 chunks; carry crosses
chunks, so per-video device memory is bounded and H2D overlaps compute.
One compilation per (frame H, frame W, instance_size) bucket.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from usot_tpu.core.crop import get_subwindow, subwindow_jax, subwindow_matmul
from usot_tpu.core.geometry import feature_axis, python2round, score_grid
from usot_tpu.models.usot import USOTNet
from usot_tpu.tracker.config import TrackerConfig
from usot_tpu.tracker.postprocess import hanning_window
from usot_tpu.tracker.tracker import _clip_number, _flip_lr


class EngineState(NamedTuple):
    """Functional tracking carry (batched engines add a leading B dim).

    The template and memory features are carried ENCODED: the kernel-side
    multi-scale encodings (3 dilated convs per branch) are pure functions
    of the pooled 7x7 features, so the engine computes them once — the
    template at init, each memory frame when written — instead of
    re-encoding the template + the whole queue every frame as the
    reference does (ref: lib/models/connect.py:229-255)."""
    pos: Any          # (2,) f32 image coords
    sz: Any           # (2,) f32
    zf_enc: Any       # (cls_z, reg_z): two 3-tuples of (1, h_i, w_i, C)
    init_enc: Any     # 3-tuple of (2, h_i, w_i, C) encoded init anchors
    mem_enc: Any      # 3-tuple of (MAX, h_i, w_i, C) encoded memory ring
    mem_conf: Any     # (MAX,)
    mem_idx: Any      # (MAX,) int32 logical frame index per slot (-1 empty)
    mem_len: Any      # () int32 LOGICAL history length (grows unbounded)


def _write_slot(mem_conf, mem_idx, mem_len, max_frames: int):
    """Ring slot to write the newest frame into.

    The reference keeps unbounded per-frame history (ref:
    usot_tracker.py:263-265); a scan carry cannot. While the buffer has
    room, slot s holds logical frame s (exact parity). Once full, the
    lowest-confidence slot is evicted (never the newest frame).

    Why min-eviction is pick-exact for arbitrarily long videos: in the
    reference sampler (usot_tracker.py:236-256, incl. its documented
    index deviation) `start_index = min(int(int(i*gap)*L), L-1)` is a
    multiple of L clamped to L-1, i.e. always 0 or L-1. So the only
    frames the reference can ever pick are frame 0 (early, pre-eviction
    regime), the running FIRST-index argmax of conf[0:L-1], and frame
    L-1. The running first-max is never the strict ring minimum, and
    under ties the eviction tie-break below (evict the LARGEST logical
    index among tied minima) keeps the first-index maximum alive.
    Proven against an unbounded-history simulator for 10k-frame traces
    (tests/test_engine.py::TestMemoryRingLongVideo).
    """
    full = mem_len >= max_frames
    last_slot = jnp.argmax(mem_idx).astype(jnp.int32)
    conf_evict = mem_conf.at[last_slot].set(jnp.inf)
    # Min-confidence slot; ties broken toward the LARGEST logical index
    # (reference argmax-over-history resolves ties to the smallest
    # index, so the smallest-index member of any tied group must be the
    # survivor here).
    min_conf = jnp.min(conf_evict)
    tied = conf_evict == min_conf
    evict = jnp.argmax(jnp.where(tied, mem_idx, -1)).astype(jnp.int32)
    return jnp.where(full, evict, jnp.minimum(mem_len, max_frames - 1))


def _memory_write(mem_feat, mem_conf, mem_idx, mem_len, feat, score):
    """Single-ring append (see _write_slot). mem_feat: (MAX, ...);
    feat: (1, ...)."""
    rings, mem_conf, mem_idx, mem_len = _memory_write_multi(
        (mem_feat,), mem_conf, mem_idx, mem_len, (feat,), score)
    return rings[0], mem_conf, mem_idx, mem_len


def _memory_write_multi(rings, mem_conf, mem_idx, mem_len, feats, score,
                        valid=None):
    """Append one frame to N parallel rings (the engine keeps the 3
    multi-scale ENCODINGS of each memory frame; all share one
    confidence/index bookkeeping). rings[i]: (S, h_i, w_i, C);
    feats[i]: (1, h_i, w_i, C).

    valid (scan padding mask): when given, the rings carry ONE EXTRA
    scratch slot (S = len(mem_conf) + 1) and an invalid frame's feature
    is written there — the real slots are untouched, so the chunk scan
    never needs a whole-ring select to freeze finished videos (ring
    selects cost ~ms/frame of pure HBM traffic at (B, MAX, 7, 7, 256)
    scale). The small conf/idx/len bookkeeping stays unconditional here
    and is masked by the caller's cheap keep-select."""
    max_frames = mem_conf.shape[0]
    write_idx = _write_slot(mem_conf, mem_idx, mem_len, max_frames)
    ring_idx = write_idx
    if valid is not None:
        ring_idx = jnp.where(valid, write_idx, max_frames)
    rings = tuple(
        jax.lax.dynamic_update_slice(
            r, f.astype(r.dtype), (ring_idx,) + (0,) * (r.ndim - 1))
        for r, f in zip(rings, feats))
    mem_conf = mem_conf.at[write_idx].set(score)
    mem_idx = mem_idx.at[write_idx].set(mem_len)
    return rings, mem_conf, mem_idx, mem_len + 1


def _memory_write_multi_batched(rings, mem_conf, mem_idx, mem_len, feats,
                                score, valid):
    """Batched-ring append across B lockstep videos (the batched engine's
    replacement for `jax.vmap(_memory_write_multi)`).

    rings[i]: (B, S+1, h, w, C) incl. the scratch slot; mem_conf (B, S);
    mem_idx (B, S); mem_len (B,); feats[i]: (B, 1, h, w, C).

    A vmapped dynamic_update_slice lowers to a scatter with per-lane
    dynamic indices — the slowest way to touch HBM on TPU. But in the
    lockstep non-full regime every lane writes the SAME slot
    (write_idx == mem_len, identical across B), so the write is a single
    contiguous (B, 1, h, w, C) block DUS; invalid (finished) lanes keep
    their old slot content via a cheap one-slot blend. Lanes diverge only
    once a ring fills (per-lane eviction) or lane lengths differ
    (mem_len frozen by _freeze_invalid) — then a lax.cond falls back to
    the exact scatter path. Formulation A/B: tools/bench_memops.py;
    exactness vs the vmapped path: tests/test_engine.py
    (TestBatchedMemoryWrite)."""
    B, S = mem_conf.shape
    write_idx = jax.vmap(_write_slot, in_axes=(0, 0, 0, None))(
        mem_conf, mem_idx, mem_len, S)                      # (B,)
    shared = jnp.all(write_idx == write_idx[0])

    def dus(rings):
        s = write_idx[0]
        out = []
        for r, f in zip(rings, feats):
            zeros = (0,) * (r.ndim - 2)
            old = jax.lax.dynamic_slice(
                r, (0, s) + zeros, (B, 1) + r.shape[2:])
            mask = valid.reshape((B,) + (1,) * (r.ndim - 1))
            blend = jnp.where(mask, f.astype(r.dtype), old)
            out.append(jax.lax.dynamic_update_slice(
                r, blend, (0, s) + zeros))
        return tuple(out)

    def scat(rings):
        ring_idx = jnp.where(valid, write_idx, S)           # scratch slot
        lanes = jnp.arange(B)
        return tuple(r.at[lanes, ring_idx].set(f[:, 0].astype(r.dtype))
                     for r, f in zip(rings, feats))

    rings = jax.lax.cond(shared, dus, scat, rings)
    lanes = jnp.arange(B)
    mem_conf = mem_conf.at[lanes, write_idx].set(score)
    mem_idx = mem_idx.at[lanes, write_idx].set(mem_len)
    return rings, mem_conf, mem_idx, mem_len + 1


def _queue_picks(mem_conf, mem_idx, mem_len, n_queue: int):
    """In-graph replica of the reference memory-queue sampling
    (ref: usot_tracker.py:222-256, incl. the documented index deviation).

    Segment bounds are computed in LOGICAL frame indices (mem_len counts
    every tracked frame, even past the buffer cap); slots are matched by
    their stored logical index, so eviction is transparent here.
    Returns (n_queue - 2,) int32 ring slots."""
    n_update = n_queue - 3
    L = mem_len.astype(jnp.float32)
    last_slot = jnp.argmax(mem_idx).astype(jnp.int32)

    def slot_of(logical):
        eq = mem_idx == logical
        return jnp.where(jnp.any(eq), jnp.argmax(eq), last_slot) \
            .astype(jnp.int32)

    picks = []
    gap = (L - 1.0) / n_update
    for i in range(n_update):
        start = jnp.minimum(jnp.floor(jnp.floor(i * gap) * L), L - 1.0)
        end = jnp.minimum(jnp.floor(jnp.floor((i + 1) * gap) * L), L - 1.0)
        start_i = start.astype(jnp.int32)
        end_i = end.astype(jnp.int32)
        in_seg = (mem_idx >= start_i) & (mem_idx < end_i)
        masked = jnp.where(in_seg, mem_conf, -jnp.inf)
        # np.argmax over the logical list returns the FIRST maximal
        # index (ref usot_tracker.py:250); slot order differs from
        # logical order once eviction wraps, so break ties explicitly
        # toward the smallest logical index.
        seg_max = jnp.max(masked)
        seg_tied = in_seg & (masked == seg_max)
        big = jnp.iinfo(jnp.int32).max
        first_max = jnp.argmin(jnp.where(seg_tied, mem_idx, big))
        seg_best = jnp.where(jnp.any(in_seg), first_max,
                             last_slot).astype(jnp.int32)
        idx = jnp.where(start_i >= end_i, slot_of(start_i), seg_best)
        picks.append(idx)
    picks.append(last_slot)

    # mem_len <= 1 fallback: every sampled slot reads frame 0
    picks = [jnp.where(mem_len <= 1, 0, p) for p in picks]
    return jnp.stack(picks)


def _assemble_queue_traced(init_feats, mem_feat, mem_conf, mem_idx, mem_len,
                           n_queue: int):
    """Single-ring queue assembly: init anchors + sampled slots.
    Returns (n_queue, 7, 7, C)."""
    picks = _queue_picks(mem_conf, mem_idx, mem_len, n_queue)
    sampled = mem_feat[picks]                     # (n_update+1, 7, 7, C)
    return jnp.concatenate([init_feats, sampled], axis=0)


def _freeze_invalid(new: EngineState, old: EngineState, is_valid):
    """Scan-padding carry freeze, sized for the hardware: only the cheap
    bookkeeping fields get a where-select. The big ring tensors are
    untouched on invalid frames by construction (the scratch-slot write
    in _memory_write_multi), and the template/init encodings are never
    modified by the step — selecting them too would move the whole
    multi-GB carry through HBM every frame. is_valid: scalar or (B,)."""
    def keep(n, o):
        return jnp.where(
            jnp.reshape(is_valid, jnp.shape(is_valid)
                        + (1,) * (n.ndim - jnp.ndim(is_valid))), n, o)

    return EngineState(
        pos=keep(new.pos, old.pos), sz=keep(new.sz, old.sz),
        zf_enc=new.zf_enc, init_enc=new.init_enc, mem_enc=new.mem_enc,
        mem_conf=keep(new.mem_conf, old.mem_conf),
        mem_idx=keep(new.mem_idx, old.mem_idx),
        mem_len=keep(new.mem_len, old.mem_len))


def make_consts(p) -> dict:
    """Per-config postprocess constants: score grid, cosine window, and
    the search-feature-axis scaling for the pool bbox."""
    instance = p.instance_size
    gx, gy = score_grid(p.score_size, p.total_stride, instance)
    window = hanning_window(p.score_size)
    sf_axis = feature_axis(p.sf_size, p.total_stride, instance)
    return dict(
        gx=jnp.asarray(gx), gy=jnp.asarray(gy),
        window=jnp.asarray(window, jnp.float32),
        sf_min=float(sf_axis[0]), sf_max=float(sf_axis[-1]),
        sf_slope=(2 * (p.sf_size // 2)) / float(sf_axis[-1] - sf_axis[0]),
    )


def _postprocess_traced(p, c, pos, sz, scale_z, cls, bbox, cls_mem):
    """In-graph single-video postprocess: penalties, cosine window,
    argmax, EMA size update, pool bbox (the f32 scan counterpart of
    tracker/postprocess.postprocess_response; deterministic-parity
    tested in tests/test_engine.py::TestPostprocessParity).

    cls/bbox/cls_mem: (1, S, S, {1,4,1}) raw head outputs;
    c: engine consts dict (gx, gy, window, sf_min/max/slope).
    Returns (new_pos (2,), new_sz (2,), best_score (), pool_bbox (4,))."""
    # Postprocess in f32 regardless of the model compute dtype
    cls = cls.astype(jnp.float32)
    bbox = bbox.astype(jnp.float32)
    cls_mem = cls_mem.astype(jnp.float32)
    cls_score = jax.nn.sigmoid(cls[0, :, :, 0])
    cls_memory = jax.nn.sigmoid(cls_mem[0, :, :, 0])
    cls_score = p.ratio * cls_score + (1 - p.ratio) * cls_memory

    bp = bbox[0]  # (S, S, 4)
    pred_x1 = c["gx"] - bp[..., 0]
    pred_y1 = c["gy"] - bp[..., 1]
    pred_x2 = c["gx"] + bp[..., 2]
    pred_y2 = c["gy"] + bp[..., 3]

    target_sz_crop = sz * scale_z
    w, h = target_sz_crop[0], target_sz_crop[1]

    def _sz(a, b):
        pad = (a + b) * 0.5
        return jnp.sqrt((a + pad) * (b + pad))

    def _change(r):
        return jnp.maximum(r, 1.0 / r)

    s_c = _change(_sz(pred_x2 - pred_x1, pred_y2 - pred_y1) / _sz(w, h))
    r_c = _change((w / h) / ((pred_x2 - pred_x1) / (pred_y2 - pred_y1)))
    penalty = jnp.exp(-(r_c * s_c - 1) * p.penalty_k)
    pscore = penalty * cls_score
    pscore = pscore * (1 - p.window_influence) \
        + c["window"] * p.window_influence
    # Degenerate-prediction guard (see postprocess.py): NaN cells lose
    pscore = jnp.where(jnp.isnan(pscore), -jnp.inf, pscore)

    flat = jnp.argmax(pscore)
    r_max = flat // pscore.shape[1]
    c_max = flat % pscore.shape[1]

    bx1 = pred_x1[r_max, c_max]
    by1 = pred_y1[r_max, c_max]
    bx2 = pred_x2[r_max, c_max]
    by2 = pred_y2[r_max, c_max]

    pred_xs = (bx1 + bx2) / 2
    pred_ys = (by1 + by2) / 2
    diff_xs = (pred_xs - p.instance_size // 2) / scale_z
    diff_ys = (pred_ys - p.instance_size // 2) / scale_z
    pred_w = (bx2 - bx1) / scale_z
    pred_h = (by2 - by1) / scale_z

    lr = penalty[r_max, c_max] * cls_score[r_max, c_max] * p.lr
    res_w = pred_w * lr + (1 - lr) * sz[0]
    res_h = pred_h * lr + (1 - lr) * sz[1]
    new_pos = jnp.stack([pos[0] + diff_xs, pos[1] + diff_ys])
    new_sz = jnp.stack([sz[0] * (1 - lr) + lr * res_w,
                        sz[1] * (1 - lr) + lr * res_h])

    best_score = cls_score[r_max, c_max]

    # Pool this frame's feature by the predicted crop bbox
    gap = 1.0 / c["sf_slope"]
    crop_bbox = jnp.stack([bx1, by1, bx2, by2])
    crop_bbox = jnp.clip(crop_bbox, c["sf_min"] - gap, c["sf_max"] + gap)
    pool_bbox = (crop_bbox - c["sf_min"]) * c["sf_slope"]
    return new_pos, new_sz, best_score, pool_bbox


class ScanEngine:
    """Per-(video-shape) jitted chunk tracker. Use via VideoTracker below."""

    def __init__(self, model: USOTNet, variables, p: TrackerConfig,
                 im_h: int, im_w: int, max_frames: int = 4096,
                 chunk: int = 64, unroll: int = 8, carry_dtype=None,
                 crop_impl: str = "auto", fused_head: bool = False):
        self.model = model
        # Folded inference-head weights (BN folded into kernels; the 6
        # search-encoder convs fused to 3 double-wide, ConfFusion's 2 to
        # 1): computed once per checkpoint here, carried inside the
        # variables pytree so every jitted chunk fn sees them.
        if fused_head:
            from usot_tpu.models.head import fold_inference_head
            pack = jax.tree.map(lambda a: np.asarray(a, model.dtype),
                                fold_inference_head(variables))
            variables = {**variables, "fused_head": pack}
        # Commit variables to the device ONCE. Checkpoint loaders hand over
        # host numpy trees; passing those to the jitted chunk fn re-uploads
        # ~100 MB of parameters on EVERY dispatch (through this runtime's
        # ~25 MB/s tunnel that alone is ~4 s/chunk — it was the dominant
        # cost of the round-1 engine, dwarfing the actual compute).
        self.variables = jax.device_put(variables)
        self.p = p
        self.im_h, self.im_w = im_h, im_w
        self.max_frames = max_frames
        self.chunk = chunk
        # Feature-carry dtype (zf / init anchors / memory ring). bf16 halves
        # the dominant carry traffic; postprocess stays f32 regardless.
        self.carry_dtype = carry_dtype if carry_dtype is not None \
            else model.dtype
        # scan unrolling: this backend taxes per-scan-iteration overhead
        # far more than FLOPs (see PERF_NOTES.md), so merging `unroll`
        # frames into each loop step buys near-linear speedups
        self.unroll = max(1, min(unroll, chunk))
        # In-graph crop: 'matmul' rides the MXU (two dynamic sparse
        # matmuls), 'gather' the VPU; identical numerics to 3e-5
        # (tests/test_misc.py). MXU wins on TPU.
        if crop_impl == "auto":
            crop_impl = "matmul" if jax.default_backend() == "tpu" \
                else "gather"
        self._crop = subwindow_matmul if crop_impl == "matmul" \
            else subwindow_jax

        self._consts = make_consts(p)

        self._chunk_fn = jax.jit(self._make_chunk_fn(),
                                 donate_argnums=(1,))

    # ---- one frame ----

    def _frame_step(self, variables, avg, im_hw, origin,
                    carry: EngineState, frame_u8, is_valid):
        """One tracked frame. frame_u8: (H, W*3) channel-flat uint8 — the
        flat layout tiles exactly on TPU ((H, W, 3) would pad the minor
        dim 3 -> 128 lanes: 42x HBM + transfer blowup). avg: (3,);
        im_hw: (2,) [h, w] valid region of the (possibly padded) frame
        canvas — traced so batched engines can mix video resolutions on
        one canvas. origin: (2,) [ox, oy] image coords of the frame
        buffer's top-left — (0, 0) for full frames; ROI streaming passes
        the extracted window's origin so carry positions stay in image
        coordinates (see track_batch_roi)."""
        p = self.p
        c = self._consts
        model = self.model
        # folded inference-head weights ride inside the variables dict
        # (an extra pytree key, NOT a flax collection) so every jitted
        # chunk fn picks them up without a signature change
        fused = variables.get("fused_head")
        variables = {k: v for k, v in variables.items()
                     if k != "fused_head"}
        frame_h = frame_u8.shape[0]
        frame_w = frame_u8.shape[1] // 3

        pos, sz = carry.pos, carry.sz
        wc_z = sz[0] + p.context_amount * (sz[0] + sz[1])
        hc_z = sz[1] + p.context_amount * (sz[0] + sz[1])
        s_z = jnp.sqrt(wc_z * hc_z)
        scale_z = p.exemplar_size / s_z
        d_search = (p.instance_size - p.exemplar_size) / 2
        s_x = jnp.round(s_z + 2 * d_search / scale_z)

        # valid region of this buffer: image extent minus the origin,
        # clipped to the buffer (full frames: min(im_h, canvas_h) etc.)
        vh = jnp.minimum(im_hw[0] - origin[1], float(frame_h))
        vw = jnp.minimum(im_hw[1] - origin[0], float(frame_w))
        x_crop = self._crop(frame_u8, pos[0] - origin[0],
                            pos[1] - origin[1], s_x, avg,
                            p.instance_size,
                            valid_h=vh, valid_w=vw,
                            channels=3)

        xf = model.apply(variables, x_crop[None].astype(model.dtype),
                         method=USOTNet.search_features)
        picks = _queue_picks(carry.mem_conf, carry.mem_idx,
                             carry.mem_len, p.mem_queue_size)
        queue_enc = tuple(
            jnp.concatenate([init, ring[picks]], axis=0).astype(model.dtype)
            for init, ring in zip(carry.init_enc, carry.mem_enc))
        zf_enc = jax.tree.map(lambda t: t.astype(model.dtype), carry.zf_enc)
        if fused is not None:
            cls, bbox, cls_mem = model.apply(
                variables, xf, zf_enc, queue_enc, fused,
                method=USOTNet.track_memory_encoded_fused)
        else:
            cls, bbox, cls_mem = model.apply(
                variables, xf, zf_enc, queue_enc,
                method=USOTNet.track_memory_encoded)
        new_pos, new_sz, best_score, pool_bbox = _postprocess_traced(
            p, c, pos, sz, scale_z, cls, bbox, cls_mem)
        feat = model.apply(variables, xf, pool_bbox[None],
                           method=USOTNet.pool_memory_feature)  # (1,7,7,C)
        feat_enc = model.apply(variables, feat,
                               method=USOTNet.encode_memory_kernels)

        mem_enc, mem_conf, mem_idx, mem_len = _memory_write_multi(
            carry.mem_enc, carry.mem_conf, carry.mem_idx, carry.mem_len,
            feat_enc, best_score, valid=is_valid)

        im_h = im_hw[0].astype(jnp.float32)
        im_w = im_hw[1].astype(jnp.float32)
        new_pos = jnp.stack([jnp.clip(new_pos[0], 0.0, im_w),
                             jnp.clip(new_pos[1], 0.0, im_h)])
        new_sz = jnp.stack([jnp.clip(new_sz[0], 10.0, im_w),
                            jnp.clip(new_sz[1], 10.0, im_h)])

        new_carry = EngineState(new_pos, new_sz, carry.zf_enc,
                                carry.init_enc, mem_enc, mem_conf, mem_idx,
                                mem_len)
        return new_carry, (new_pos, new_sz, best_score)

    def _make_chunk_fn(self):
        def chunk_fn(variables, carry, frames_u8, valid, avg, im_hw,
                     origin):
            def body(carry, xs):
                frame, is_valid = xs
                new_carry, out = self._frame_step(variables, avg, im_hw,
                                                  origin, carry, frame,
                                                  is_valid)
                return _freeze_invalid(new_carry, carry, is_valid), out

            carry, outs = jax.lax.scan(body, carry, (frames_u8, valid),
                                       unroll=self.unroll)
            return carry, outs

        return chunk_fn

    # ---- host API ----

    def _init_host(self, im, target_pos, target_sz):
        """Pure host-side init work: the template crop and the two memory
        bootstrap crops + their pool labels (ref: usot_tracker.py:22-131).
        No device dispatch — batched engines stack these across videos."""
        p = self.p
        target_pos = np.asarray(target_pos, np.float64)
        target_sz = np.asarray(target_sz, np.float64)
        avg_chans = np.mean(im, axis=(0, 1))

        wc_z = target_sz[0] + p.context_amount * target_sz.sum()
        hc_z = target_sz[1] + p.context_amount * target_sz.sum()
        s_z = round(np.sqrt(wc_z * hc_z))

        tf_axis = feature_axis(p.tf_size, p.total_stride, p.exemplar_size)
        z_crop, info = get_subwindow(im, target_pos, p.exemplar_size, s_z,
                                     avg_chans, target_sz, need_bbox=True)
        tb = np.clip(np.asarray(info["template_bbox"], np.float32),
                     tf_axis[0], tf_axis[-1])
        tb = (tb - tf_axis[0]) * (2 * (p.tf_size // 2)) / (tf_axis[-1]
                                                           - tf_axis[0])

        s_z_f = np.sqrt(wc_z * hc_z)
        scale_z = p.exemplar_size / s_z_f
        s_x = s_z_f + 2 * ((p.instance_size - p.exemplar_size) / 2) / scale_z
        x_crop, info = get_subwindow(im, target_pos, p.instance_size,
                                     python2round(s_x), avg_chans,
                                     target_sz, need_bbox=True)
        sf_axis = feature_axis(p.sf_size, p.total_stride, p.instance_size)

        def pool_label(bbox):
            gap = (sf_axis[-1] - sf_axis[0]) / (2 * (p.sf_size // 2))
            b = np.clip(np.asarray(bbox, np.float32), sf_axis[0] - gap,
                        sf_axis[-1] + gap)
            return (b - sf_axis[0]) / gap

        x_aug, bbox_aug = _flip_lr(np.asarray(x_crop), info["template_bbox"])
        bbox_aug = [_clip_number(bbox_aug[0], _max=x_aug.shape[1]),  # x vs W
                    _clip_number(bbox_aug[1], _max=x_aug.shape[0]),  # y vs H
                    _clip_number(bbox_aug[2], _max=x_aug.shape[1]),
                    _clip_number(bbox_aug[3], _max=x_aug.shape[0])]
        return dict(
            pos=target_pos, sz=target_sz, avg=avg_chans,
            z_crop=np.asarray(z_crop, np.float32), tb=tb,
            x_crop=np.asarray(x_crop, np.float32),
            sb0=pool_label(info["template_bbox"]),
            x_aug=x_aug.astype(np.float32), sb1=pool_label(bbox_aug))

    def _assemble_state(self, h, zf_enc, feat_enc) -> EngineState:
        """feat_enc: 3-tuple of (2, h_i, w_i, C) — encoded [bootstrap,
        flipped-bootstrap] anchors; slot 0 of each ring starts with the
        unflipped bootstrap (ref: usot_tracker.py:141-142). The rings are
        allocated on DEVICE (jnp.zeros) — uploading a zeroed
        (MAX, ...) buffer through a slow host link costs seconds."""
        cd = self.carry_dtype
        # +1: scratch slot for invalid-frame writes (see _memory_write_multi)
        mem_enc = tuple(
            jnp.zeros((self.max_frames + 1,) + tuple(f.shape[1:]), cd)
            .at[0].set(f[0].astype(cd))
            for f in feat_enc)
        mem_conf = jnp.zeros((self.max_frames,), jnp.float32)
        mem_conf = mem_conf.at[0].set(0.9)
        mem_idx = jnp.full((self.max_frames,), -1, jnp.int32)
        mem_idx = mem_idx.at[0].set(0)
        init_enc = tuple(f.astype(cd) for f in feat_enc)
        return EngineState(
            pos=jnp.asarray(h["pos"], jnp.float32),
            sz=jnp.asarray(h["sz"], jnp.float32),
            zf_enc=jax.tree.map(lambda t: t.astype(cd), zf_enc),
            init_enc=init_enc, mem_enc=mem_enc,
            mem_conf=mem_conf, mem_idx=mem_idx,
            mem_len=jnp.asarray(1, jnp.int32))

    def init_state(self, im, target_pos, target_sz, runner) -> EngineState:
        """Host-side per-video init: template + memory bootstrap (2 host
        crops, matching the reference init; ref: usot_tracker.py:22-131)."""
        h = self._init_host(im, target_pos, target_sz)
        self.avg_chans = h["avg"]
        zf = runner.template(h["z_crop"], h["tb"])
        zf_enc = runner.encode_template(zf)
        feat0 = runner.extract_memory_feature(x_hwc=h["x_crop"],
                                              search_bbox=h["sb0"])
        feat1 = runner.extract_memory_feature(x_hwc=h["x_aug"],
                                              search_bbox=h["sb1"])
        feat_enc = runner.encode_memory_kernels(
            jnp.concatenate([feat0, feat1], axis=0))
        return self._assemble_state(h, zf_enc, feat_enc)

    def iter_chunks(self, state: EngineState, frames_u8: np.ndarray,
                    im_hw=None):
        """Stream-track frames chunk by chunk. Yields
        (frame_offset, n_valid, state, outs) per dispatched chunk with
        `outs` still on device (defer D2H: upload of chunk i+1 overlaps
        compute of chunk i). Callers that detect a failure inside a
        yielded chunk simply stop iterating — at most one wasted chunk
        (the VOT restart protocol, ref: test_usot.py:85-103)."""
        n = len(frames_u8)
        hw = (self.im_h, self.im_w) if im_hw is None else im_hw
        avg = jnp.asarray(self.avg_chans, jnp.float32)
        for i in range(0, n, self.chunk):
            block = frames_u8[i:i + self.chunk]
            nb = len(block)
            if nb < self.chunk:
                pad = np.repeat(block[-1:], self.chunk - nb, axis=0)
                block = np.concatenate([block, pad], axis=0)
            # channel-flat (T, H, W*3): exact TPU tiling (see subwindow_jax)
            block = np.reshape(block, block.shape[:2] + (-1,))
            valid = jnp.asarray(np.arange(self.chunk) < nb)
            state, outs = self._chunk_fn(
                self.variables, state, jnp.asarray(block), valid, avg,
                jnp.asarray([hw[0], hw[1]], jnp.float32),
                jnp.zeros((2,), jnp.float32))
            yield i, nb, state, outs

    def track_frames(self, state: EngineState, frames_u8: np.ndarray,
                     im_hw=None):
        """Track a batch of frames (N, H, W, 3) uint8. Returns
        (state, positions (N,2), sizes (N,2), scores (N,)).

        im_hw optionally gives the true (h, w) of the video when frames
        are padded onto a larger canvas (resolution-bucketed compiles)."""
        pending = []
        for _, nb, state, outs in self.iter_chunks(state, frames_u8, im_hw):
            pending.append((nb, outs))
        all_pos = [np.asarray(o[0][:nb]) for nb, o in pending]
        all_sz = [np.asarray(o[1][:nb]) for nb, o in pending]
        all_score = [np.asarray(o[2][:nb]) for nb, o in pending]
        return state, np.concatenate(all_pos), np.concatenate(all_sz), \
            np.concatenate(all_score)


class BatchScanEngine(ScanEngine):
    """Tracks B videos in lockstep: the per-frame step is vmapped over the
    video dimension inside the scan, so a whole benchmark shard saturates
    the MXU (BASELINE config 4: batched multi-sequence eval).

    All videos share one TrackerConfig (instance size) and are padded onto
    a common (canvas_h, canvas_w) uint8 canvas; per-video true (h, w) ride
    in the batch state for crop validity and clamping.
    """

    def __init__(self, model: USOTNet, variables, p: TrackerConfig,
                 canvas_h: int, canvas_w: int, batch: int,
                 max_frames: int = 2048, chunk: int = 32,
                 impl: str = "vmap", unroll: int = 1,
                 crop_impl: str = "auto", mesh=None,
                 fused_head: bool = False):
        """impl: 'vmap' maps the single-video step over videos; 'native'
        feeds the net real (B, ...) batches — equal speed with the fused
        Pallas correlation (PERF_NOTES.md).

        mesh: optional jax.sharding.Mesh with a 'data' axis. Tracking is
        embarrassingly data-parallel over videos: the lockstep batch dim
        shards across chips (frames, carry, per-video constants all
        split on 'data'; variables replicated); XLA SPMD needs no
        collectives in the step, so throughput scales with the mesh.
        batch must divide by the mesh's data-axis size."""
        self.batch = batch
        self.impl = impl
        self.mesh = mesh
        super().__init__(model, variables, p, im_h=canvas_h, im_w=canvas_w,
                         max_frames=max_frames, chunk=chunk, unroll=unroll,
                         crop_impl=crop_impl, fused_head=fused_head)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert batch % mesh.shape["data"] == 0, \
                "batch must divide the data-axis size"
            rep = NamedSharding(mesh, P())
            b0 = NamedSharding(mesh, P("data"))     # batch-leading arrays
            b1 = NamedSharding(mesh, P(None, "data"))  # (T, B, ...) arrays
            self._shard_rep = rep
            self._shard_b0 = b0
            self._shard_b1 = b1
            # self.variables (set by super().__init__) already carries the
            # folded-head pack; re-place the whole tree replicated
            self.variables = jax.device_put(self.variables, rep)
            carry_sh = EngineState(*([b0] * len(EngineState._fields)))
            self._jit_shardings = dict(
                in_shardings=(rep, carry_sh, b1, b1, b0, b0, b0),
                out_shardings=(carry_sh, (b1, b1, b1)))
            self._chunk_fn = jax.jit(
                self._make_chunk_fn(), donate_argnums=(1,),
                **self._jit_shardings)

    @property
    def _chunk_fn_nodonate(self):
        """The same chunk program compiled WITHOUT carry donation, for
        the ROI first attempt (the input carry must survive for a
        possible exactness replay). Built lazily: only ROI callers pay
        the extra compile."""
        fn = getattr(self, "_chunk_fn_nd", None)
        if fn is None:
            kw = getattr(self, "_jit_shardings", {})
            fn = jax.jit(self._make_chunk_fn(), **kw)
            self._chunk_fn_nd = fn
        return fn

    def _frame_step_batched(self, variables, avg_b, im_hw_b, origin_b,
                            carry, frames, is_valid):
        """Natively-batched frame step: the network sees real (B, ...)
        batches (full MXU tiles) — only the light gather/scalar pieces
        (crop, queue sampling) are vmapped. A vmap-of-batch-1 formulation
        lowers the grouped-conv correlation poorly; this one does not."""
        p = self.p
        c = self._consts
        model = self.model
        fused = variables.get("fused_head")
        variables = {k: v for k, v in variables.items()
                     if k != "fused_head"}
        B = frames.shape[0]
        frame_h = frames.shape[1]
        frame_w = frames.shape[2] // 3

        pos, sz = carry.pos, carry.sz                    # (B, 2)
        wc_z = sz[:, 0] + p.context_amount * (sz[:, 0] + sz[:, 1])
        hc_z = sz[:, 1] + p.context_amount * (sz[:, 0] + sz[:, 1])
        s_z = jnp.sqrt(wc_z * hc_z)
        scale_z = p.exemplar_size / s_z                  # (B,)
        d_search = (p.instance_size - p.exemplar_size) / 2
        s_x = jnp.round(s_z + 2 * d_search / scale_z)

        crop = jax.vmap(
            lambda im, px, py, ssx, av, vh, vw: self._crop(
                im, px, py, ssx, av, p.instance_size,
                valid_h=vh, valid_w=vw, channels=3))
        vh = jnp.minimum(im_hw_b[:, 0] - origin_b[:, 1], float(frame_h))
        vw = jnp.minimum(im_hw_b[:, 1] - origin_b[:, 0], float(frame_w))
        x_crop = crop(frames, pos[:, 0] - origin_b[:, 0],
                      pos[:, 1] - origin_b[:, 1],
                      s_x, avg_b, vh, vw)                # (B, S, S, 3)

        xf = model.apply(variables, x_crop.astype(model.dtype),
                         method=USOTNet.search_features)
        picks = jax.vmap(_queue_picks, in_axes=(0, 0, 0, None))(
            carry.mem_conf, carry.mem_idx, carry.mem_len,
            p.mem_queue_size)                                # (B, Nq-2)
        queue_enc = []
        for init, ring in zip(carry.init_enc, carry.mem_enc):
            k = picks.shape[1]
            idx = picks.reshape(picks.shape + (1, 1, 1))
            sampled = jnp.take_along_axis(
                ring, jnp.broadcast_to(
                    idx, (B, k) + tuple(ring.shape[2:])), axis=1)
            queue_enc.append(jnp.concatenate([init, sampled], axis=1)
                             .astype(model.dtype))           # (B,Nq,h,w,C)
        zf_enc = jax.tree.map(lambda t: t[:, 0].astype(model.dtype),
                              carry.zf_enc)
        if fused is not None:
            cls, bbox, cls_mem = model.apply(
                variables, xf, zf_enc, tuple(queue_enc), fused,
                method=USOTNet.track_memory_encoded_fused)
        else:
            cls, bbox, cls_mem = model.apply(
                variables, xf, zf_enc, tuple(queue_enc),
                method=USOTNet.track_memory_encoded_batched)
        # Shared postprocess: the SAME function as the single-video path
        # (_postprocess_traced), vmapped over the batch — penalties,
        # window, argmax, EMA and pool bbox cannot diverge between the
        # two engines. All ops are elementwise/argmax/gather, so the
        # batched lowering is identical math.
        new_pos, new_sz, best_score, pool_bbox = jax.vmap(
            lambda ps, szv, sclz, cl, bb, cm: _postprocess_traced(
                p, c, ps, szv, sclz, cl, bb, cm))(
            pos, sz, scale_z, cls[:, None], bbox[:, None],
            cls_mem[:, None])
        feat = model.apply(variables, xf, pool_bbox,
                           method=USOTNet.pool_memory_feature)  # (B,7,7,C)
        feat_enc = model.apply(variables, feat,
                               method=USOTNet.encode_memory_kernels)
        feat_enc = tuple(f[:, None] for f in feat_enc)  # (B,1,h,w,C)

        mem_enc, mem_conf, mem_idx, mem_len = _memory_write_multi_batched(
            carry.mem_enc, carry.mem_conf, carry.mem_idx, carry.mem_len,
            feat_enc, best_score, is_valid)

        im_h = im_hw_b[:, 0]
        im_w = im_hw_b[:, 1]
        new_pos = jnp.stack([jnp.clip(new_pos[:, 0], 0.0, im_w),
                             jnp.clip(new_pos[:, 1], 0.0, im_h)], -1)
        new_sz = jnp.stack([jnp.clip(new_sz[:, 0], 10.0, im_w),
                            jnp.clip(new_sz[:, 1], 10.0, im_h)], -1)

        new_carry = EngineState(new_pos, new_sz, carry.zf_enc,
                                carry.init_enc, mem_enc, mem_conf, mem_idx,
                                mem_len)
        return new_carry, (new_pos, new_sz, best_score)

    def _make_chunk_fn(self):
        if getattr(self, "impl", "vmap") == "native":
            step = self._frame_step_batched
        else:
            step = jax.vmap(self._frame_step,
                            in_axes=(None, 0, 0, 0, 0, 0, 0))

        def chunk_fn(variables, carry, frames_u8, valid, avg, im_hw,
                     origin):
            # frames_u8: (T, B, H, W*3); valid: (T, B); origin: (B, 2)
            def body(carry, xs):
                frame, is_valid = xs
                new_carry, out = step(variables, avg, im_hw, origin,
                                      carry, frame, is_valid)
                return _freeze_invalid(new_carry, carry, is_valid), out

            carry, outs = jax.lax.scan(body, carry, (frames_u8, valid),
                                       unroll=self.unroll)
            return carry, outs

        return chunk_fn

    def init_batch(self, videos, runner):
        """videos: list of (first_frame, target_pos, target_sz). Returns a
        batched EngineState.

        The init crops are host cv2 work; the model passes are batched
        across the whole lockstep group — 2 dispatches total (template for
        B videos, memory bootstrap for 2B crops) instead of 3 per video
        (ref init path: usot_tracker.py:22-131)."""
        hosts = [self._init_host(im, pos, sz) for im, pos, sz in videos]
        hws = [[im.shape[0], im.shape[1]] for im, _, _ in videos]

        z = np.stack([h["z_crop"] for h in hosts])            # (B, T, T, 3)
        tb = np.stack([h["tb"] for h in hosts])               # (B, 4)
        zf_b = runner.template_batch(z, tb)                   # (B, 7, 7, C)
        zf_enc = runner.encode_template(zf_b)

        xs = np.stack([h[k] for h in hosts for k in ("x_crop", "x_aug")])
        sbs = np.stack([h[k] for h in hosts for k in ("sb0", "sb1")])
        feats = runner.extract_memory_feature_batch(xs, sbs)  # (2B, 7,7,C)
        feat_enc = runner.encode_memory_kernels(feats)        # 3x(2B,h,w,C)

        # The (B, MAX, ...) rings are allocated ON DEVICE and slot 0 is
        # written there — materializing them host-side would push
        # gigabyte-scale zero buffers through the host link at init.
        B = len(hosts)
        cd = self.carry_dtype
        # +1: scratch slot for invalid-frame writes (see _memory_write_multi)
        mem_enc = tuple(
            jnp.zeros((B, self.max_frames + 1) + tuple(f.shape[1:]), cd)
            .at[:, 0].set(f[0::2].astype(cd))
            for f in feat_enc)
        init_enc = tuple(
            jnp.stack([f[0::2], f[1::2]], axis=1).astype(cd)  # (B,2,h,w,C)
            for f in feat_enc)
        mem_conf = jnp.zeros((B, self.max_frames), jnp.float32) \
            .at[:, 0].set(0.9)
        mem_idx = jnp.full((B, self.max_frames), -1, jnp.int32) \
            .at[:, 0].set(0)

        self._avg_b = jnp.asarray(np.stack([h["avg"] for h in hosts]),
                                  jnp.float32)
        self._im_hw_b = jnp.asarray(np.asarray(hws), jnp.float32)
        # Floor for suggest_roi: the crop-window span at init. A tracker
        # that loses its target collapses the size EMA, and an ROI sized
        # from the collapsed s_x guarantees a replay the moment the
        # window has to cover re-acquisition motion — shrinking the
        # stream window below its init span never saves enough bytes to
        # be worth that replay.
        pos0 = np.stack([h["pos"] for h in hosts]).astype(np.float64)
        sz0 = np.stack([h["sz"] for h in hosts]).astype(np.float64)
        ix0, ix1, _, _ = self._crop_window(pos0, sz0)
        self._init_span = float(np.max(ix1 - ix0))
        return EngineState(
            pos=jnp.asarray(np.stack([h["pos"] for h in hosts]),
                            jnp.float32),
            sz=jnp.asarray(np.stack([h["sz"] for h in hosts]), jnp.float32),
            # (B, 1, h, w, C): the singleton keeps the per-video model
            # batch dim so the vmapped single-video step sees (1, h, w, C)
            zf_enc=jax.tree.map(lambda t: t[:, None].astype(cd), zf_enc),
            init_enc=init_enc, mem_enc=mem_enc,
            mem_conf=mem_conf, mem_idx=mem_idx,
            mem_len=jnp.full((B,), 1, jnp.int32))

    def _prep_chunks(self, frames_u8: np.ndarray, n_valid: np.ndarray):
        """Host-side chunking of (B, N, H, W, 3) into flat (T, B, H, W*3)
        uint8 blocks + (T, B) validity masks. Yields (nb, block, valid)."""
        b, n = frames_u8.shape[:2]
        assert b == self.batch
        for i in range(0, n, self.chunk):
            block = frames_u8[:, i:i + self.chunk]
            nb = block.shape[1]
            if nb < self.chunk:
                pad = np.repeat(block[:, -1:], self.chunk - nb, axis=1)
                block = np.concatenate([block, pad], axis=1)
            # (T, B) validity
            t_idx = np.arange(self.chunk)[:, None] + i
            valid = jnp.asarray(t_idx < n_valid[None, :])
            # (T, B, H, W*3) channel-flat: exact TPU tiling
            block_tb = np.swapaxes(block, 0, 1)
            block_tb = np.reshape(np.ascontiguousarray(block_tb),
                                  block_tb.shape[:3] + (-1,))
            yield nb, block_tb, valid

    def _collate(self, pending):
        all_pos = [np.asarray(o[0][:nb]) for nb, o in pending]
        all_sz = [np.asarray(o[1][:nb]) for nb, o in pending]
        all_score = [np.asarray(o[2][:nb]) for nb, o in pending]
        pos = np.concatenate(all_pos).transpose(1, 0, 2)
        sz = np.concatenate(all_sz).transpose(1, 0, 2)
        score = np.concatenate(all_score).transpose(1, 0)
        return pos, sz, score

    def track_batch(self, state, frames_u8: np.ndarray,
                    n_valid: np.ndarray):
        """frames_u8: (B, N, H, W, 3) padded canvas frames; n_valid: (B,)
        true frame counts. Returns (state, pos (B,N,2), sz (B,N,2),
        score (B,N))."""
        pending = []  # defer D2H so host upload of chunk i+1 overlaps
        zero_origin = jnp.zeros((self.batch, 2), jnp.float32)
        for nb, block_tb, valid in self._prep_chunks(frames_u8, n_valid):
            state, outs = self._chunk_fn(
                self.variables, state, jnp.asarray(block_tb), valid,
                self._avg_b, self._im_hw_b, zero_origin)
            pending.append((nb, outs))
        return (state,) + self._collate(pending)

    def _crop_window(self, pos, sz):
        """Host mirror of the device crop geometry: returns the inclusive
        pixel span [x0, x1], [y0, y1] the bilinear crop may tap for a
        frame stepped from (pos, sz). +1 past the window for the second
        bilinear tap."""
        p = self.p
        wc = sz[:, 0] + p.context_amount * (sz[:, 0] + sz[:, 1])
        hc = sz[:, 1] + p.context_amount * (sz[:, 0] + sz[:, 1])
        s_z = np.sqrt(wc * hc)
        scale_z = p.exemplar_size / s_z
        d_search = (p.instance_size - p.exemplar_size) / 2
        s_x = np.round(s_z + 2 * d_search / scale_z)
        x0 = np.round(pos[:, 0] - (s_x + 1.0) / 2.0)
        y0 = np.round(pos[:, 1] - (s_x + 1.0) / 2.0)
        return x0, x0 + s_x, y0, y0 + s_x

    def suggest_roi(self, state, chunk: int = None, drift: float = 2.0,
                    margin: float = 2.0, align: int = 32,
                    growth: float = 1.2, stale_chunks: int = 2) -> int:
        """Pick an ROI size for track_batch_roi from the CURRENT batch
        state: the crop-window span s_x (deterministic in target size)
        plus headroom for the target drifting `drift` px/frame over the
        window between ROI anchor and the last frame read through it.

        stale_chunks: how many chunks of drift the anchor can be behind.
        With pipeline=True (track_batch_roi's default) the speculative
        chunk's ROI is anchored at a position one FULL chunk stale, so
        its windows carry up to 2*chunk frames of drift — budgeting only
        1*chunk (the round-4 default) made every speculative chunk
        marginal and produced the alternating ok/replay thrash in
        BENCH_r04 (3/6 chunks replayed). Pass 1 for pipeline=False.

        growth: headroom factor on the target-size-dependent span s_x —
        the tracker's size EMA grows the estimated target over a run
        (lr_box updates), which grows s_x after this suggestion is made.

        Larger targets or faster motion than the allowance just replay —
        exactness never depends on this heuristic, only throughput (and
        track_batch_roi now re-sizes from the replayed trajectory, so a
        bad guess costs one replay, not a thrash)."""
        chunk = self.chunk if chunk is None else chunk
        pos = np.asarray(state.pos, np.float64)
        sz = np.asarray(state.sz, np.float64)
        x0, x1, _, _ = self._crop_window(pos, sz)
        # Floor at the init-time span: a collapsed size EMA (lost
        # target) must not shrink the window below what tracking the
        # ORIGINAL target needs — under-sizing costs a full-frame
        # replay, which dwarfs the bytes the smaller window saves.
        s_x = max(float(np.max(x1 - x0)),
                  getattr(self, "_init_span", 0.0))
        need = s_x * growth + 1 + 2 * (margin + drift * chunk
                                       * stale_chunks)
        return int(-(-need // align) * align)

    def warm_roi(self, state, roi: int, chunk: int = None):
        """Compile (or cache-load) the ROI chunk program outside any
        timed region: dispatches one all-invalid dummy chunk through the
        non-donating program track_batch_roi uses. The carry freezes on
        invalid frames and the result is discarded, so `state` is
        untouched."""
        chunk = self.chunk if chunk is None else chunk
        dummy = jnp.zeros((chunk, self.batch, roi, roi * 3), jnp.uint8)
        novalid = jnp.zeros((chunk, self.batch), bool)
        _, outs = self._chunk_fn_nodonate(
            self.variables, state, dummy, novalid, self._avg_b,
            self._im_hw_b, jnp.zeros((self.batch, 2), jnp.float32))
        jax.block_until_ready(outs)

    def _roi_slice(self, block, pos_h, roi):
        """Slice a (B, chunk, H, W, 3) uint8 block to per-video
        (chunk, B, roi, roi*3) windows centered on pos_h, clamped inside
        the canvas. Returns (roi_block, ox, oy)."""
        b = block.shape[0]
        chunk = block.shape[1]
        H, W = block.shape[2], block.shape[3]
        ox = np.clip(np.round(pos_h[:, 0] - roi / 2), 0,
                     np.maximum(W - roi, 0))
        oy = np.clip(np.round(pos_h[:, 1] - roi / 2), 0,
                     np.maximum(H - roi, 0))
        roi_block = np.empty((chunk, b, roi, roi * 3), np.uint8)
        for v in range(b):
            xs, ys = int(ox[v]), int(oy[v])
            roi_block[:, v] = block[v, :, ys:ys + roi,
                                    xs:xs + roi].reshape(
                chunk, roi, roi * 3)
        return roi_block, ox, oy

    def _roi_ok(self, pos_np, sz_np, pos_h, sz_h, ox, oy, roi, nb,
                valid_np, margin):
        """Exactness check for one returned chunk: frame t's crop window
        comes from the state after frame t-1 (chunk-start state for t=0);
        every window [+margin], clipped to the true image (outside-image
        taps read avg either way), must sit inside [origin, origin+roi)."""
        im_hw = np.asarray(self._im_hw_b)
        prev_pos = np.concatenate([pos_h[None], pos_np[:nb - 1]])
        prev_sz = np.concatenate([sz_h[None], sz_np[:nb - 1]])
        for t in range(nb):
            x0, x1, y0, y1 = self._crop_window(prev_pos[t], prev_sz[t])
            rx0 = np.maximum(x0 - margin, 0)
            rx1 = np.minimum(x1 + margin, im_hw[:, 1] - 1)
            ry0 = np.maximum(y0 - margin, 0)
            ry1 = np.minimum(y1 + margin, im_hw[:, 0] - 1)
            inside = (rx0 >= ox) & (rx1 <= ox + roi - 1) \
                & (ry0 >= oy) & (ry1 <= oy + roi - 1)
            inside = inside | ~valid_np[t]  # finished videos: no req
            if not inside.all():
                return False
        return True

    def _roi_needed(self, pos_np, sz_np, pos_h, sz_h, anchor, nb,
                    valid_np, margin) -> float:
        """Minimal ROI size, centered on the anchor this chunk was
        dispatched with, that would have contained every (clipped) crop
        window of the chunk's TRUE trajectory. The clamped origin
        placement _roi_slice uses covers at least the centered
        placement's canvas intersection, so `_roi_ok` failing implies
        needed > the attempted roi — escalating straight to `needed`
        converges in one replay instead of climbing a blind ladder."""
        im_hw = np.asarray(self._im_hw_b)
        prev_pos = np.concatenate([pos_h[None], pos_np[:nb - 1]])
        prev_sz = np.concatenate([sz_h[None], sz_np[:nb - 1]])
        need = 0.0
        for t in range(nb):
            x0, x1, y0, y1 = self._crop_window(prev_pos[t], prev_sz[t])
            rx0 = np.maximum(x0 - margin, 0)
            rx1 = np.minimum(x1 + margin, im_hw[:, 1] - 1)
            ry0 = np.maximum(y0 - margin, 0)
            ry1 = np.minimum(y1 + margin, im_hw[:, 0] - 1)
            half = np.maximum.reduce(
                [anchor[:, 0] - rx0, rx1 - anchor[:, 0],
                 anchor[:, 1] - ry0, ry1 - anchor[:, 1]])
            half = np.where(valid_np[t], half, 0.0)
            need = max(need, float(np.max(half)))
        # +2: inclusive-span and np.round(origin) slack
        return 2.0 * need + 2.0

    def track_batch_roi(self, state, frames_u8: np.ndarray,
                        n_valid: np.ndarray, roi: int = 384,
                        margin: float = 2.0, chunk: int = None,
                        pipeline: bool = True, escalate: bool = True):
        """track_batch with ROI streaming: per chunk, upload only a
        (roi x roi) window around each video's last known position
        instead of the full canvas — the structural fix for streamed
        tracking through slow host links (this dev tunnel moves ~25 MB/s;
        full 480x640 frames cap ANY engine at ~25 fps).

        Exactness is checked, not assumed: after each chunk returns, the
        host recomputes every frame's crop-window span from the returned
        trajectory (the window for frame t depends on the state AFTER
        frame t-1) and checks (window [+margin] ∩ image) ⊆ ROI. A
        violated chunk is REPLAYED from a saved carry with full frames.
        Accepted chunks read the same pixels as track_batch; outputs
        match up to f32 coordinate arithmetic (~1e-5 relative — the crop
        center is expressed ROI-relative).

        pipeline: dispatch the NEXT chunk speculatively before the host
        has validated the current one. The speculative chunk's ROI is
        anchored at the last pos the host actually knows (one chunk
        stale), so its windows carry one extra chunk of drift — but its
        carry input is the device-side output of the in-flight chunk, so
        the device runs chunks back-to-back and the host's slice+upload
        of chunk k+1 overlaps compute+download of chunk k, instead of
        the link idling during every sync round-trip. Exactness is
        untouched: the validity check runs on actual trajectories vs the
        actual uploaded origins; a failed chunk discards the speculative
        work and replays from the saved carry.

        escalate: EVERY replay re-sizes the ROI from the replayed true
        trajectory (_roi_needed) — a mis-sized window (target grew,
        erratic motion, stale speculative anchor) converges in one
        replay instead of thrashing; a failure always implies
        needed > roi, so the size grows strictly. Each new size
        compiles one more chunk program (persistent-cached across
        runs). Cost-based fallback (escalate=True only): when the
        escalated ROI upload is >= 80% of a full frame, or the overall
        replay fraction exceeds 40% after 5+ chunks (safety net —
        every replay re-uploads the chunk at FULL frames, the worst
        outcome for a path built to save bytes), the rest of the run
        is handed to track_batch. Telemetry after any run:
        roi_replays, roi_chunks, roi_escalations, roi_final,
        roi_fallback, roi_bytes_sent, roi_bytes_full_equiv.

        chunk: dispatch granularity, default self.chunk. Streaming wants
        SHORTER chunks than staged tracking: the ROI origin is anchored
        at chunk start, so the drift headroom (hence roi, hence bytes on
        the wire) grows linearly with chunk length. The scan length is
        traced from the input shape, so a non-default chunk just
        compiles one more chunk program (persistent-cached).
        """
        chunk = self.chunk if chunk is None else chunk
        b, n = frames_u8.shape[:2]
        assert b == self.batch
        H, W = frames_u8.shape[2], frames_u8.shape[3]
        self.roi_replays = 0
        self.roi_chunks = 0
        self.roi_escalations = 0
        self.roi_final = roi
        self.roi_fallback = False
        self.roi_bytes_sent = 0
        self.roi_bytes_full_equiv = 0
        if roi >= min(H, W):
            self.roi_fallback = True
            return self.track_batch(state, frames_u8, n_valid)
        zero_origin = jnp.zeros((b, 2), jnp.float32)
        pos_h = np.asarray(state.pos, np.float64)         # sync snapshot
        sz_h = np.asarray(state.sz, np.float64)
        pending = {}       # chunk index -> (nb, outs-like)
        starts = list(range(0, n, chunk))

        def prep(i):
            block = frames_u8[:, i:i + chunk]
            nb = block.shape[1]
            if nb < chunk:
                pad = np.repeat(block[:, -1:], chunk - nb, axis=1)
                block = np.concatenate([block, pad], axis=1)
            t_idx = np.arange(chunk)[:, None] + i
            valid = np.asarray(t_idx < n_valid[None, :])
            return block, nb, valid

        def replay(rec):
            """Full-frame replay of a failed chunk, consuming its saved
            input carry through the donating program."""
            block_tb = np.swapaxes(rec["block"], 0, 1)
            block_tb = np.reshape(np.ascontiguousarray(block_tb),
                                  block_tb.shape[:3] + (-1,))
            st, outs = self._chunk_fn(
                self.variables, rec["state_in"], jnp.asarray(block_tb),
                jnp.asarray(rec["valid"]), self._avg_b, self._im_hw_b,
                zero_origin)
            self.roi_bytes_sent += block_tb.nbytes
            pos_np, sz_np = [np.asarray(a, np.float64)
                             for a in jax.device_get((outs[0], outs[1]))]
            return st, (pos_np, sz_np, outs[2])

        # The ROI attempt must keep its input carry alive for a possible
        # replay. Rather than deep-copying the carry every chunk (the
        # memory ring alone is GB-scale at B=32), dispatch through a
        # non-donating compilation of the same chunk fn: identical peak
        # memory (input + output carry coexist either way), zero copy
        # traffic. The replay then consumes the saved carry through the
        # donating fn.
        def dispatch(j, anchor_pos, state_in, cur_roi):
            block, nb, valid = prep(starts[j])
            roi_block, ox, oy = self._roi_slice(block, anchor_pos,
                                                cur_roi)
            origin = jnp.asarray(np.stack([ox, oy], -1), jnp.float32)
            st, outs = self._chunk_fn_nodonate(
                self.variables, state_in, jax.device_put(roi_block),
                jnp.asarray(valid), self._avg_b, self._im_hw_b, origin)
            self.roi_chunks += 1
            self.roi_bytes_sent += roi_block.nbytes
            self.roi_bytes_full_equiv += b * chunk * H * W * 3
            return dict(j=j, nb=nb, block=block, valid=valid, ox=ox,
                        oy=oy, roi=cur_roi, state_in=state_in,
                        state_out=st, outs=outs,
                        anchor=np.asarray(anchor_pos, np.float64))

        def hand_off(state):
            """Hand the remaining frames to full-frame track_batch (the
            bit-identical full-frame program): ROI streaming stopped
            paying for itself on this run."""
            self.roi_fallback = True
            self.roi_final = min(H, W)
            i_rest = starts[j] if j < len(starts) else n
            done = [pending[k] for k in sorted(pending)]
            if i_rest >= n:
                return (state,) + self._collate(done)
            nv = np.clip(n_valid - i_rest, 0, n - i_rest)
            state, p2, s2, c2 = self.track_batch(
                state, frames_u8[:, i_rest:], nv)
            pos, sz, sc = self._collate(done)
            return (state,
                    np.concatenate([pos, p2], axis=1),
                    np.concatenate([sz, s2], axis=1),
                    np.concatenate([sc, c2], axis=1))

        depth = 2 if pipeline else 1
        inflight = []
        j = 0              # next chunk index to dispatch
        while j < len(starts) or inflight:
            while j < len(starts) and len(inflight) < depth:
                # anchor: last host-known pos — exact for the first
                # in-flight chunk, one chunk stale for the speculative
                # one (the validity check covers the difference)
                st_in = inflight[-1]["state_out"] if inflight else state
                inflight.append(dispatch(j, pos_h, st_in, roi))
                j += 1
            rec = inflight.pop(0)
            nb = rec["nb"]
            pos_np, sz_np = [np.asarray(a, np.float64) for a in
                             jax.device_get((rec["outs"][0],
                                             rec["outs"][1]))]
            if self._roi_ok(pos_np, sz_np, pos_h, sz_h, rec["ox"],
                            rec["oy"], rec["roi"], nb, rec["valid"],
                            margin):
                state = rec["state_out"]
                pending[rec["j"]] = (nb, (pos_np, sz_np, rec["outs"][2]))
            else:
                # speculative successors read a wrong carry: discard
                # them and rewind the dispatch cursor
                j = rec["j"] + 1
                inflight.clear()
                self.roi_replays += 1
                state, outs_h = replay(rec)
                pos_np, sz_np = outs_h[0], outs_h[1]
                pending[rec["j"]] = (nb, outs_h)
                if escalate:
                    # re-size from the replayed TRUE trajectory: at the
                    # point of failure pos_h/sz_h still hold the state
                    # ENTERING rec (updated only after each processed
                    # chunk), and rec carries the anchor it was
                    # dispatched with — _roi_needed gives the size that
                    # would have held this chunk, and failure implies
                    # needed > roi, so the size grows strictly.
                    need = self._roi_needed(pos_np, sz_np, pos_h, sz_h,
                                            rec["anchor"], nb,
                                            rec["valid"], margin)
                    new_roi = int(-(-max(need, roi + 1.0) // 32) * 32)
                    if new_roi > roi:
                        self.roi_escalations += 1
                    frac = self.roi_replays / max(self.roi_chunks, 1)
                    if (new_roi >= min(H, W)
                            or new_roi * new_roi >= 0.8 * H * W
                            or (self.roi_chunks >= 5 and frac > 0.4)):
                        return hand_off(state)
                    roi = new_roi
                    self.roi_final = roi
            pos_h = pos_np[nb - 1]
            sz_h = sz_np[nb - 1]
        done = [pending[k] for k in sorted(pending)]
        return (state,) + self._collate(done)

    # ---- lane surgery (VOT restart protocol + lane refill) ----

    def run_chunk(self, state, block_tb, valid, donate: bool = True):
        """One chunk dispatch on pre-assembled (T, B, H, W*3) uint8
        frames + (T, B) validity. donate=False keeps `state` alive so a
        protocol driver can replay the chunk from it after carry surgery
        (the VOT restart path, tracker/lockstep.py)."""
        fn = self._chunk_fn if donate else self._chunk_fn_nodonate
        return fn(self.variables, state, jnp.asarray(block_tb),
                  jnp.asarray(valid), self._avg_b, self._im_hw_b,
                  jnp.zeros((self.batch, 2), jnp.float32))

    def make_lane_state(self, im, target_pos, target_sz, runner):
        """Per-video init producing the pieces `splice_lane` writes into
        one lane of a batched carry. Uses the SAME B=1 model passes as
        ScanEngine.init_state, so a restarted / refilled lane starts
        from a state identical to a fresh single-video engine's (the
        reference restart protocol re-enters tracker.init the same way,
        ref: scripts/test_usot.py:98-103 -> lib/tracker/usot_tracker.py
        init)."""
        h = self._init_host(im, target_pos, target_sz)
        zf = runner.template(h["z_crop"], h["tb"])
        zf_enc = runner.encode_template(zf)      # (cls, reg) of (1,h,w,C)
        feat0 = runner.extract_memory_feature(x_hwc=h["x_crop"],
                                              search_bbox=h["sb0"])
        feat1 = runner.extract_memory_feature(x_hwc=h["x_aug"],
                                              search_bbox=h["sb1"])
        feat_enc = runner.encode_memory_kernels(
            jnp.concatenate([feat0, feat1], axis=0))  # 3x (2, h, w, C)
        return dict(
            pos=np.asarray(h["pos"], np.float32),
            sz=np.asarray(h["sz"], np.float32),
            avg=np.asarray(h["avg"], np.float32),
            im_hw=np.asarray([im.shape[0], im.shape[1]], np.float32),
            zf_enc=zf_enc, feat_enc=feat_enc)

    @property
    def _splice_fn(self):
        """Jitted one-lane carry overwrite. The big ring tensors are NOT
        reset wholesale: only slot 0 is written, the lane's conf/idx/len
        bookkeeping is reset, and stale ring content becomes unreachable
        (queue picks match slots by stored logical index, _queue_picks)
        — so a splice moves KBs, not the (MAX, ...) ring."""
        fn = getattr(self, "_splice_jit", None)
        if fn is None:
            S = self.max_frames

            def splice(carry, avg_b, im_hw_b, lane, pos, sz, avg, im_hw,
                       zf_enc, feat_enc):
                def put(arr, val):
                    return jax.lax.dynamic_update_slice(
                        arr, val.astype(arr.dtype)[None],
                        (lane,) + (0,) * (arr.ndim - 1))

                new = EngineState(
                    pos=put(carry.pos, pos),
                    sz=put(carry.sz, sz),
                    zf_enc=jax.tree.map(lambda a, v: put(a, v),
                                        carry.zf_enc, zf_enc),
                    init_enc=tuple(
                        put(a, v) for a, v in zip(carry.init_enc,
                                                  feat_enc)),
                    # slot 0 <- unflipped bootstrap; rest left stale
                    mem_enc=tuple(
                        jax.lax.dynamic_update_slice(
                            r, v[:1][None].astype(r.dtype),
                            (lane, 0) + (0,) * (r.ndim - 2))
                        for r, v in zip(carry.mem_enc, feat_enc)),
                    mem_conf=put(
                        carry.mem_conf,
                        jnp.zeros((S,), jnp.float32).at[0].set(0.9)),
                    mem_idx=put(
                        carry.mem_idx,
                        jnp.full((S,), -1, jnp.int32).at[0].set(0)),
                    mem_len=jax.lax.dynamic_update_slice(
                        carry.mem_len, jnp.ones((1,), jnp.int32),
                        (lane,)),
                )
                return new, put(avg_b, avg), put(im_hw_b, im_hw)

            kw = {}
            if self.mesh is not None:
                carry_sh = self._jit_shardings["in_shardings"][1]
                kw = dict(out_shardings=(carry_sh, self._shard_b0,
                                         self._shard_b0))
            self._splice_jit = jax.jit(splice, donate_argnums=(0, 1, 2),
                                       **kw)
            fn = self._splice_jit
        return fn

    def splice_lane(self, state: EngineState, lane: int,
                    lane_state: dict) -> EngineState:
        """Overwrite one lane of a batched carry with a fresh video init
        (from make_lane_state) and update the engine's per-lane avg /
        im_hw rows. Used by the VOT restart protocol (re-init a failed
        lane mid-benchmark) and by lane refill (start the next pending
        video in a finished lane)."""
        zf_enc = jax.tree.map(jnp.asarray, lane_state["zf_enc"])
        feat_enc = tuple(jnp.asarray(f) for f in lane_state["feat_enc"])
        state, self._avg_b, self._im_hw_b = self._splice_fn(
            state, self._avg_b, self._im_hw_b,
            jnp.asarray(lane, jnp.int32),
            jnp.asarray(lane_state["pos"]),
            jnp.asarray(lane_state["sz"]),
            jnp.asarray(lane_state["avg"]),
            jnp.asarray(lane_state["im_hw"]),
            zf_enc, feat_enc)
        return state

    def make_lane_states(self, videos, runner):
        """Batched `make_lane_state` for K <= B fresh videos: host crops
        per video, then ONE set of lockstep-group-shaped model passes
        (padded to the engine batch so no new program shape compiles)
        instead of ~5 B=1 dispatches per video. Built for lane refill,
        where several lanes finish at the same chunk boundary and every
        dispatch costs a host-link round trip. Numerics are the batched
        init path's (same as init_batch), not the B=1 path's — VOT
        restarts keep `make_lane_state` for strict scan-path parity.

        Returns a stacked lane-state dict for `splice_lanes`."""
        B, K = self.batch, len(videos)
        assert 1 <= K <= B
        hosts = [self._init_host(im, pos, sz) for im, pos, sz in videos]
        hws = [[im.shape[0], im.shape[1]] for im, _, _ in videos]
        hosts += [hosts[0]] * (B - K)
        hws += [hws[0]] * (B - K)

        z = np.stack([h["z_crop"] for h in hosts])
        tb = np.stack([h["tb"] for h in hosts])
        zf_enc = runner.encode_template(runner.template_batch(z, tb))
        xs = np.stack([h[k] for h in hosts for k in ("x_crop", "x_aug")])
        sbs = np.stack([h[k] for h in hosts for k in ("sb0", "sb1")])
        feat_enc = runner.encode_memory_kernels(
            runner.extract_memory_feature_batch(xs, sbs))  # 3x (2B,h,w,C)
        return dict(
            k=K,
            pos=np.stack([h["pos"] for h in hosts]).astype(np.float32),
            sz=np.stack([h["sz"] for h in hosts]).astype(np.float32),
            avg=np.stack([h["avg"] for h in hosts]).astype(np.float32),
            im_hw=np.asarray(hws, np.float32),
            zf_enc=zf_enc, feat_enc=feat_enc)

    @property
    def _splice_multi_fn(self):
        """Jitted K-lane carry overwrite (one dispatch for a whole chunk
        boundary's refills). Padding entries carry lane index == B,
        which is out of bounds — XLA scatter's drop mode makes them
        no-ops, so one compiled program serves every K."""
        fn = getattr(self, "_splice_multi_jit", None)
        if fn is None:
            S = self.max_frames
            B = self.batch

            def splice(carry, avg_b, im_hw_b, lanes, pos, sz, avg, im_hw,
                       zf_enc, feat_enc):
                def put(arr, vals):
                    return arr.at[lanes].set(vals.astype(arr.dtype),
                                             mode="drop")

                new = EngineState(
                    pos=put(carry.pos, pos),
                    sz=put(carry.sz, sz),
                    zf_enc=jax.tree.map(
                        lambda a, v: put(a, v[:, None]),
                        carry.zf_enc, zf_enc),
                    init_enc=tuple(
                        put(a, jnp.stack([v[0::2], v[1::2]], axis=1))
                        for a, v in zip(carry.init_enc, feat_enc)),
                    # slot 0 <- unflipped bootstrap; rest left stale
                    # (unreachable: queue picks match stored logical idx)
                    mem_enc=tuple(
                        r.at[lanes, 0].set(v[0::2].astype(r.dtype),
                                           mode="drop")
                        for r, v in zip(carry.mem_enc, feat_enc)),
                    mem_conf=put(
                        carry.mem_conf,
                        jnp.zeros((B, S), jnp.float32).at[:, 0].set(0.9)),
                    mem_idx=put(
                        carry.mem_idx,
                        jnp.full((B, S), -1, jnp.int32).at[:, 0].set(0)),
                    mem_len=put(carry.mem_len,
                                jnp.ones((B,), jnp.int32)),
                )
                return new, put(avg_b, avg), put(im_hw_b, im_hw)

            kw = {}
            if self.mesh is not None:
                carry_sh = self._jit_shardings["in_shardings"][1]
                kw = dict(out_shardings=(carry_sh, self._shard_b0,
                                         self._shard_b0))
            self._splice_multi_jit = jax.jit(splice,
                                             donate_argnums=(0, 1, 2),
                                             **kw)
            fn = self._splice_multi_jit
        return fn

    def splice_lanes(self, state: EngineState, lanes,
                     lane_states: dict) -> EngineState:
        """Splice K fresh videos (from `make_lane_states`) into K lanes
        of a batched carry in ONE jitted dispatch."""
        B = self.batch
        k = lane_states["k"]
        assert len(lanes) == k
        lanes_pad = np.full((B,), B, np.int32)  # OOB -> scatter drops
        lanes_pad[:k] = lanes
        state, self._avg_b, self._im_hw_b = self._splice_multi_fn(
            state, self._avg_b, self._im_hw_b, jnp.asarray(lanes_pad),
            jnp.asarray(lane_states["pos"]),
            jnp.asarray(lane_states["sz"]),
            jnp.asarray(lane_states["avg"]),
            jnp.asarray(lane_states["im_hw"]),
            jax.tree.map(jnp.asarray, lane_states["zf_enc"]),
            tuple(jnp.asarray(f) for f in lane_states["feat_enc"]))
        return state

    def stage_frames(self, frames_u8: np.ndarray, n_valid: np.ndarray):
        """Pre-upload every chunk of a (B, N, H, W, 3) frame tensor into
        device HBM (flat layout); returns an opaque list for
        `track_staged`. Rationale: a production host feeds the chip at
        PCIe/NIC rates (GB/s), but this dev environment reaches the chip
        through a ~25 MB/s tunnel — staging first lets a benchmark measure
        chip tracking throughput rather than tunnel bandwidth."""
        staged = [(nb, jax.device_put(block), valid)
                  for nb, block, valid in self._prep_chunks(frames_u8,
                                                            n_valid)]
        # Force EVERY upload to complete (block_until_ready is a no-op
        # through the tunnel runtime; a tiny dependent D2H per block is
        # the only true fence — uploads are independent transfers, so
        # syncing just the last block leaves earlier ones in flight).
        for _, block, _ in staged:
            np.asarray(block[0, 0, 0, :1])
        return staged

    def track_staged(self, state, staged):
        """Track pre-staged chunks (see stage_frames). Same returns as
        track_batch."""
        pending = []
        zero_origin = jnp.zeros((self.batch, 2), jnp.float32)
        for nb, block_dev, valid in staged:
            state, outs = self._chunk_fn(
                self.variables, state, block_dev, valid, self._avg_b,
                self._im_hw_b, zero_origin)
            pending.append((nb, outs))
        return (state,) + self._collate(pending)
