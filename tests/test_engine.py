"""Scan-engine tests: mechanics + agreement with the parity tracker."""
import os

import numpy as np
import jax
import pytest

from usot_tpu.models.calibrate import calibrate_batch_stats
from usot_tpu.models.usot import build_usot, init_variables
from usot_tpu.tracker.config import TrackerConfig
from usot_tpu.tracker.engine import ScanEngine
from usot_tpu.tracker.runner import ModelRunner
from usot_tpu.tracker.tracker import USOTTracker

from test_tracker import synthetic_video


@pytest.fixture(scope="module")
def setup():
    model = build_usot(mem_size=2)
    variables = init_variables(model, jax.random.PRNGKey(1))
    variables = calibrate_batch_stats(model, variables, n_iter=10)
    runner = ModelRunner(model, variables)
    return model, variables, runner


class TestScanEngine:
    def test_tracks_video(self, setup):
        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=10)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size

        engine = ScanEngine(model, variables, p,
                            im_h=frames[0].shape[0], im_w=frames[0].shape[1],
                            max_frames=64, chunk=4)
        state = engine.init_state(frames[0], np.array(centers[0], float),
                                  np.array([48.0, 48.0]), runner)
        state, pos, sz, score = engine.track_frames(
            state, np.stack(frames[1:]))
        assert pos.shape == (9, 2) and sz.shape == (9, 2)
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(sz))
        assert np.all(sz >= 10)
        assert int(state.mem_len) == 10

    def test_matches_parity_tracker_first_frames(self, setup):
        """Engine and host-parity tracker should produce very close
        trajectories (f32 vs f64 postprocess; same weights)."""
        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=6)

        tracker = USOTTracker()
        st = tracker.init(frames[0], np.array(centers[0], float),
                          np.array([48.0, 48.0]), runner)
        ref_pos = []
        for im in frames[1:]:
            st = tracker.track(st, im)
            ref_pos.append(np.array(st["target_pos"]))

        p = TrackerConfig()
        p.instance_size = st["p"].instance_size
        p.renew()
        p.sf_size = p.score_size
        engine = ScanEngine(model, variables, p,
                            im_h=frames[0].shape[0], im_w=frames[0].shape[1],
                            max_frames=64, chunk=8)
        est = engine.init_state(frames[0], np.array(centers[0], float),
                                np.array([48.0, 48.0]), runner)
        est, pos, sz, score = engine.track_frames(est, np.stack(frames[1:]))

        ref_pos = np.stack(ref_pos)
        # With random (calibrated) weights the response map is noise, so
        # the argmax is chaotic: tiny f32-vs-f64 crop/postprocess
        # differences can flip the winning cell, making any px bound on
        # THIS setup meaningless. This test only checks both paths stay
        # well-behaved; sub-pixel full-step agreement is pinned with the
        # committed TRAINED fixture below (TestTrainedFixtureParity).
        err = np.linalg.norm(pos - ref_pos, axis=1)
        assert np.all(np.isfinite(err))


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_usot_w8c32.msgpack")


class TestTrainedFixtureParity:
    """Full-step sub-pixel parity on a committed TRAINED checkpoint
    (tools/make_tiny_fixture.py: width-8/channels-32 dev-scale model,
    synthetic recipe). A trained response map is peaked, so the scan
    engine (f32, on-device) and the host parity tracker (f64 postprocess)
    must take identical argmax decisions — a postprocess, crop, queue, or
    memory-write regression now fails the suite at 0.5 px instead of
    hiding under random-weight chaos (retires the old err<130 bound)."""

    @pytest.fixture(scope="class")
    def tiny(self):
        from flax import serialization

        with open(FIXTURE, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        model = build_usot(mem_size=int(restored.get("mem_size", 2)),
                           width=int(restored.get("width", 8)),
                           channels=int(restored.get("channels", 32)))
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        return model, variables, ModelRunner(model, variables)

    def test_scan_matches_parity_subpixel_20_frames(self, tiny,
                                                    monkeypatch):
        """Crop pixels are the ONE intended engine/parity difference
        (cv2 fixed-point uint8 vs float bilinear — cross-tested to <1.0
        mean intensity, tests/test_misc.py); feeding the parity tracker
        the engine's float crop for track-time windows isolates the rest
        of the step — backbone, heads, queue sampling, memory write,
        postprocess — which must then agree to sub-pixel for 20 frames."""
        import jax.numpy as jnp

        from usot_tpu.core.crop import get_subwindow, subwindow_jax
        import usot_tpu.tracker.tracker as tracker_mod

        model, variables, runner = tiny
        frames, centers = synthetic_video(n_frames=21)

        def float_crop(im, pos, model_sz, original_sz, avg_chans,
                       target_sz=None, need_bbox=False):
            if target_sz is not None or need_bbox:
                # init-path crops (engine init uses the same host path)
                return get_subwindow(im, pos, model_sz, original_sz,
                                     avg_chans, target_sz, need_bbox)
            dev = subwindow_jax(jnp.asarray(im, jnp.float32),
                                float(pos[0]), float(pos[1]),
                                float(original_sz),
                                jnp.asarray(avg_chans, jnp.float32),
                                model_sz)
            return np.asarray(dev), {}

        monkeypatch.setattr(tracker_mod, "get_subwindow", float_crop)

        tracker = USOTTracker()
        st = tracker.init(frames[0], np.array(centers[0], float),
                          np.array([48.0, 48.0]), runner)
        ref_pos, ref_sz = [], []
        for im in frames[1:]:
            st = tracker.track(st, im)
            ref_pos.append(np.array(st["target_pos"]))
            ref_sz.append(np.array(st["target_sz"]))
        ref_pos, ref_sz = np.stack(ref_pos), np.stack(ref_sz)

        p = TrackerConfig()
        p.instance_size = st["p"].instance_size
        p.renew()
        p.sf_size = p.score_size
        engine = ScanEngine(model, variables, p,
                            im_h=frames[0].shape[0],
                            im_w=frames[0].shape[1],
                            max_frames=64, chunk=8)
        est = engine.init_state(frames[0], np.array(centers[0], float),
                                np.array([48.0, 48.0]), runner)
        _, pos, sz, _ = engine.track_frames(est, np.stack(frames[1:]))

        err = np.linalg.norm(pos - ref_pos, axis=1)
        assert err.max() <= 0.5, f"scan-vs-parity px err {err}"
        np.testing.assert_allclose(sz, ref_sz, atol=0.5)

    def test_fixture_actually_tracks(self, tiny):
        """The committed checkpoint follows the synthetic target (sanity:
        the parity assertions above are only meaningful on a tracker
        whose argmax follows signal, not noise)."""
        model, variables, runner = tiny
        frames, centers = synthetic_video(n_frames=13)
        tracker = USOTTracker()
        st = tracker.init(frames[0], np.array(centers[0], float),
                          np.array([48.0, 48.0]), runner)
        errs = []
        for f, im in enumerate(frames[1:], start=1):
            st = tracker.track(st, im)
            errs.append(np.linalg.norm(
                np.asarray(st["target_pos"]) - np.asarray(centers[f])))
        assert np.mean(errs) < 24.0, f"center errors {errs}"


class TestMemoryRing:
    """The capped memory ring must reproduce the reference's unbounded
    history semantics (ref: usot_tracker.py:222-265) for videos far longer
    than the buffer: logical segment sampling + min-confidence eviction."""

    def _reference_picks(self, confs, n_queue):
        """Unbounded-history queue picks, reference arithmetic
        (usot_tracker.py:236-256 incl. the documented index deviation)."""
        n_update = n_queue - 3
        L = len(confs)
        if L <= 1:
            return [0] * (n_update + 1)
        picks = []
        gap = (L - 1) / n_update
        for i in range(n_update):
            start = min(int(int(i * gap) * L), L - 1)
            end = min(int(int((i + 1) * gap) * L), L - 1)
            if start >= end:
                picks.append(start)
            else:
                picks.append(int(np.argmax(np.asarray(confs[start:end])))
                             + start)
        picks.append(L - 1)
        return picks

    @pytest.mark.parametrize("n_frames,max_frames", [(30, 8), (100, 16)])
    def test_capped_ring_matches_unbounded_reference(self, n_frames,
                                                     max_frames):
        import jax.numpy as jnp
        from usot_tpu.tracker.engine import (_assemble_queue_traced,
                                             _memory_write)

        rng = np.random.default_rng(3)
        n_queue = 7
        C = 4
        # distinct per-frame features so picks are identifiable
        feats = rng.normal(size=(n_frames, 7, 7, C)).astype(np.float32)
        confs = rng.random(n_frames).astype(np.float32)
        confs[0] = 0.9  # init bootstrap confidence

        mem_feat = jnp.zeros((max_frames, 7, 7, C))
        mem_feat = mem_feat.at[0].set(feats[0])
        mem_conf = jnp.zeros((max_frames,))
        mem_conf = mem_conf.at[0].set(confs[0])
        mem_idx = jnp.full((max_frames,), -1, jnp.int32)
        mem_idx = mem_idx.at[0].set(0)
        mem_len = jnp.asarray(1, jnp.int32)
        init_feats = jnp.zeros((2, 7, 7, C))

        write = jax.jit(_memory_write)
        assemble = jax.jit(
            lambda f, c, i, l: _assemble_queue_traced(
                init_feats, f, c, i, l, n_queue))

        for t in range(1, n_frames):
            queue = assemble(mem_feat, mem_conf, mem_idx, mem_len)
            ref = self._reference_picks(confs[:t], n_queue)
            expected = feats[ref]                       # (n_update+1,...)
            np.testing.assert_allclose(np.asarray(queue[2:]), expected,
                                       atol=0, rtol=0,
                                       err_msg=f"frame {t}")
            mem_feat, mem_conf, mem_idx, mem_len = write(
                mem_feat, mem_conf, mem_idx, mem_len,
                jnp.asarray(feats[t][None]), jnp.asarray(confs[t]))

        assert int(mem_len) == n_frames  # logical length keeps counting


class TestMemoryRingLongVideo(TestMemoryRing):
    """Adversarial pick-parity proof for videos far beyond the buffer cap
    (VERDICT r2 #1): the capped ring + min-eviction must pick IDENTICAL
    frames to the reference's unbounded history (usot_tracker.py:222-265)
    for 10k-frame traces, including confidence-tie regimes where
    slot-order vs logical-order argmax could diverge."""

    def _scan_picks(self, confs, max_frames, n_queue=7):
        """Run the real ring ops over the whole trace in one lax.scan.
        Features are identity-coded (value == logical frame index) so the
        assembled queue reveals exactly which frames were picked."""
        import jax.numpy as jnp
        from usot_tpu.tracker.engine import (_assemble_queue_traced,
                                             _memory_write)
        T = len(confs)
        init_feats = jnp.full((2, 7, 7, 1), -1.0)

        def step(carry, x):
            mem_feat, mem_conf, mem_idx, mem_len = carry
            feat_val, conf = x
            queue = _assemble_queue_traced(init_feats, mem_feat, mem_conf,
                                           mem_idx, mem_len, n_queue)
            picks = queue[2:, 0, 0, 0].astype(jnp.int32)
            carry = _memory_write(mem_feat, mem_conf, mem_idx, mem_len,
                                  jnp.full((1, 7, 7, 1), feat_val),
                                  conf)
            return carry, picks

        mem_feat = jnp.zeros((max_frames, 7, 7, 1))
        mem_conf = jnp.zeros((max_frames,))
        mem_conf = mem_conf.at[0].set(confs[0])
        mem_idx = jnp.full((max_frames,), -1, jnp.int32)
        mem_idx = mem_idx.at[0].set(0)
        carry = (mem_feat, mem_conf, mem_idx, jnp.asarray(1, jnp.int32))
        xs = (jnp.arange(1, T, dtype=jnp.float32),
              jnp.asarray(confs[1:]))
        _, picks = jax.lax.scan(step, carry, xs)
        return np.asarray(picks)      # (T-1, n_queue-2)

    def _trace(self, mode, T, rng):
        if mode == "random":
            confs = rng.random(T).astype(np.float32)
        elif mode == "ties":
            # heavy quantization: many exact confidence ties, so first-
            # index argmax vs slot-order argmax actually differ
            confs = (rng.integers(0, 4, size=T) / 4.0).astype(np.float32)
        elif mode == "descending":
            # every new frame is the running minimum: eviction pressure
            # concentrates on recent frames, running max stays frame 0
            confs = np.linspace(1.0, 0.01, T).astype(np.float32)
        elif mode == "ascending":
            # running max keeps moving to the newest frame
            confs = np.linspace(0.01, 1.0, T).astype(np.float32)
        elif mode == "constant":
            # pathological all-tied trace: reference picks are pinned to
            # first-index semantics throughout
            confs = np.full(T, 0.5, np.float32)
        else:
            raise AssertionError(mode)
        confs[0] = 0.9
        return confs

    @pytest.mark.parametrize("mode,T,max_frames", [
        ("random", 10000, 2048),
        ("random", 3000, 64),
        ("ties", 3000, 64),
        ("descending", 2000, 64),
        ("ascending", 2000, 64),
        ("constant", 1500, 32),
    ])
    def test_pick_parity_10k(self, mode, T, max_frames):
        rng = np.random.default_rng(7)
        confs = self._trace(mode, T, rng)
        got = self._scan_picks(confs, max_frames)
        n_queue = 7
        for t in range(1, T):
            ref = self._reference_picks(confs[:t], n_queue)
            if not np.array_equal(got[t - 1], ref):
                raise AssertionError(
                    f"mode={mode} frame {t}: engine {got[t-1].tolist()} "
                    f"!= reference {ref}")


class TestBatchedMemoryWrite:
    """_memory_write_multi_batched (shared-slot block DUS + scatter
    fallback) must agree EXACTLY with the vmapped per-lane write in
    every regime: lockstep non-full (shared slot), post-eviction
    (diverged slots), mixed valid masks, and frozen-lane length skew."""

    SCALES = ((5, 5), (3, 5), (5, 3))

    def _mk(self, rng, B, S, C=8):
        import jax.numpy as jnp
        rings = tuple(jnp.asarray(
            rng.normal(size=(B, S + 1, h, w, C)), jnp.float32)
            for h, w in self.SCALES)
        feats = tuple(jnp.asarray(
            rng.normal(size=(B, 1, h, w, C)), jnp.float32)
            for h, w in self.SCALES)
        return rings, feats

    @pytest.mark.parametrize("regime", ["shared", "evicting", "skewed"])
    def test_matches_vmapped(self, regime):
        import jax.numpy as jnp
        from usot_tpu.tracker.engine import (_memory_write_multi,
                                             _memory_write_multi_batched)
        rng = np.random.default_rng(11)
        B, S, T = 4, 6, 16
        rings, feats0 = self._mk(rng, B, S)
        mem_conf = jnp.zeros((B, S))
        mem_idx = jnp.full((B, S), -1, jnp.int32)
        if regime == "skewed":
            # lanes at different logical lengths -> diverged write slots
            mem_len = jnp.asarray([0, 1, 2, 3], jnp.int32)
        else:
            mem_len = jnp.zeros((B,), jnp.int32)

        vmapped = jax.jit(jax.vmap(_memory_write_multi))
        batched = jax.jit(_memory_write_multi_batched)

        a = (rings, mem_conf, mem_idx, mem_len)
        b = (rings, mem_conf, mem_idx, mem_len)
        for t in range(T):  # T > S: exercises the full/eviction regime
            feats = tuple(f + t for f in feats0)
            score = jnp.asarray(rng.random(B), jnp.float32)
            if regime == "shared":
                valid = jnp.ones((B,), bool)
            else:
                valid = jnp.asarray(rng.integers(0, 2, B), bool)
            a = vmapped(a[0], a[1], a[2], a[3], feats, score, valid)
            b = batched(b[0], b[1], b[2], b[3], feats, score, valid)
            for ra, rb in zip(a[0], b[0]):
                # scratch slot content may differ (garbage by design);
                # every real slot must match exactly
                np.testing.assert_array_equal(
                    np.asarray(ra[:, :S]), np.asarray(rb[:, :S]),
                    err_msg=f"{regime} step {t}")
            for x, y in zip(a[1:], b[1:]):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=f"{regime} step {t}")


class TestPostprocessParity:
    """Deterministic scan-postprocess regression guard (VERDICT r2 #7):
    the engine's in-graph postprocess must match the host parity path
    (tracker/postprocess.postprocess_response, f64) to sub-pixel
    precision on smooth response maps — no trained checkpoint needed,
    and a regression in either path fails on CPU."""

    def test_traced_matches_host_f64(self):
        import jax.numpy as jnp

        from usot_tpu.core.geometry import image_bbox_to_pool_bbox, \
            feature_axis
        from usot_tpu.tracker.engine import (_postprocess_traced,
                                             make_consts)
        from usot_tpu.tracker.postprocess import postprocess_response

        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        c = make_consts(p)
        S = p.score_size
        rng = np.random.default_rng(9)

        traced = jax.jit(lambda *a: _postprocess_traced(p, c, *a))

        for trial in range(25):
            # smooth logits: noise + a clear Gaussian bump => the argmax
            # is stable under f32-vs-f64 rounding
            yy, xx = np.mgrid[0:S, 0:S]
            cy, cx = rng.integers(3, S - 3, 2)
            bump = 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
            cls = (0.3 * rng.normal(size=(S, S)) + bump)
            cls_mem = (0.3 * rng.normal(size=(S, S)) + bump)
            # plausible exp-decoded ltrb offsets
            bbox = rng.uniform(8.0, 60.0, (S, S, 4))
            pos = rng.uniform(100, 400, 2)
            sz = rng.uniform(30, 120, 2)
            scale_z = float(p.exemplar_size / np.sqrt(np.prod(sz + 0.5
                                                              * sz.sum())))

            got_pos, got_sz, got_score, got_pool = traced(
                jnp.asarray(pos, jnp.float32), jnp.asarray(sz, jnp.float32),
                jnp.float32(scale_z),
                jnp.asarray(cls[None, :, :, None], jnp.float32),
                jnp.asarray(bbox[None], jnp.float32),
                jnp.asarray(cls_mem[None, :, :, None], jnp.float32))

            def sigmoid(x):
                return 1.0 / (1.0 + np.exp(-x))

            want_pos, want_sz, want_score, want_bbox = postprocess_response(
                sigmoid(cls), sigmoid(cls_mem), np.moveaxis(bbox, -1, 0),
                np.asarray(c["gx"], np.float64),
                np.asarray(c["gy"], np.float64),
                np.asarray(c["window"], np.float64),
                pos.astype(np.float64), (sz * scale_z).astype(np.float64),
                scale_z, p.instance_size, p.ratio, p.penalty_k,
                p.window_influence, p.lr, xp=np)
            sf_axis = feature_axis(p.sf_size, p.total_stride,
                                   p.instance_size)
            want_pool = image_bbox_to_pool_bbox(want_bbox, sf_axis,
                                                p.sf_size, clip_gap=1.0)

            np.testing.assert_allclose(np.asarray(got_pos), want_pos,
                                       atol=0.5, err_msg=f"trial {trial}")
            np.testing.assert_allclose(np.asarray(got_sz), want_sz,
                                       atol=0.5, err_msg=f"trial {trial}")
            np.testing.assert_allclose(np.asarray(got_pool), want_pool,
                                       atol=0.05, err_msg=f"trial {trial}")
            assert abs(float(got_score) - want_score) < 1e-3


class TestBatchScanEngine:
    def test_batched_matches_single(self, setup):
        """Two identical videos tracked in batch must match the single-video
        scan engine exactly (same math, vmapped)."""
        import jax.numpy as jnp
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=7)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size

        single = ScanEngine(model, variables, p, im_h=frames[0].shape[0],
                            im_w=frames[0].shape[1], max_frames=32, chunk=3)
        st = single.init_state(frames[0], np.array(centers[0], float),
                               np.array([48.0, 48.0]), runner)
        _, pos_s, sz_s, score_s = single.track_frames(st, np.stack(frames[1:]))

        batch = BatchScanEngine(model, variables, p,
                                canvas_h=frames[0].shape[0],
                                canvas_w=frames[0].shape[1], batch=2,
                                max_frames=32, chunk=3)
        videos = [(frames[0], np.array(centers[0], float),
                   np.array([48.0, 48.0]))] * 2
        bstate = batch.init_batch(videos, runner)
        fb = np.stack([np.stack(frames[1:])] * 2)
        _, pos_b, sz_b, score_b = batch.track_batch(
            bstate, fb, n_valid=np.array([6, 6]))

        np.testing.assert_allclose(pos_b[0], pos_s, atol=1e-3)
        np.testing.assert_allclose(pos_b[1], pos_s, atol=1e-3)
        np.testing.assert_allclose(sz_b[0], sz_s, atol=1e-3)

    def test_ragged_lengths(self, setup):
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=7)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        batch = BatchScanEngine(model, variables, p,
                                canvas_h=frames[0].shape[0],
                                canvas_w=frames[0].shape[1], batch=2,
                                max_frames=32, chunk=4)
        videos = [(frames[0], np.array(centers[0], float),
                   np.array([48.0, 48.0]))] * 2
        bstate = batch.init_batch(videos, runner)
        fb = np.stack([np.stack(frames[1:])] * 2)
        st, pos, sz, score = batch.track_batch(
            bstate, fb, n_valid=np.array([6, 3]))
        assert np.all(np.isfinite(pos[0]))
        # video 1's carry freezes after its 3 valid frames: the final state
        # position equals the output at its last valid frame (outputs past
        # n_valid are padding and not used by callers)
        np.testing.assert_allclose(np.asarray(st.pos[1]), pos[1][2],
                                   atol=1e-5)


class TestROIStreaming:
    def test_roi_matches_full(self, setup):
        """ROI streaming matches full-frame tracking (same pixels read;
        ~1e-5 relative f32 coordinate noise); escaped chunks replay."""
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=9)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]

        def make():
            batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                    canvas_w=W, batch=2, max_frames=32,
                                    chunk=3)
            videos = [(frames[0], np.array(centers[0], float),
                       np.array([48.0, 48.0]))] * 2
            return batch, batch.init_batch(videos, runner)

        fb = np.stack([np.stack(frames[1:])] * 2)
        nv = np.array([8, 8])

        batch, st = make()
        _, pos_f, sz_f, score_f = batch.track_batch(st, fb, n_valid=nv)

        # ROI sized to cover the search window: no replays expected
        batch, st = make()
        _, pos_r, sz_r, score_r = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=min(H, W) - 8)
        # pipelined dispatch anchors speculative chunks one chunk
        # stale: a different (still valid) ROI origin shifts the
        # ROI-relative f32 crop arithmetic ~1e-4 relative
        np.testing.assert_allclose(pos_r, pos_f, atol=1e-2, rtol=2e-4)
        np.testing.assert_allclose(sz_r, sz_f, atol=1e-2, rtol=2e-4)
        assert batch.roi_replays == 0, \
            "covering ROI should not trigger replays"
        assert not batch.roi_fallback
        assert batch.roi_bytes_sent > 0

        # ROI too small for the search window, serial + no escalation:
        # every chunk replays, and the result is still exact
        batch, st = make()
        _, pos_t, sz_t, _ = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=64, pipeline=False, escalate=False)
        # all-replayed chunks ARE bit-identical (full-frame path)
        np.testing.assert_allclose(pos_t, pos_f, atol=1e-5)
        assert batch.roi_replays == batch.roi_chunks

        # streaming chunk != engine chunk: same trajectory, more
        # dispatches (the scan length is traced from the input shape)
        batch, st = make()
        roi = batch.suggest_roi(st, chunk=2)
        assert roi % 32 == 0 and roi > 0
        batch.warm_roi(st, roi=min(H, W) - 8, chunk=2)
        _, pos_c, sz_c, _ = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=min(H, W) - 8, chunk=2)
        np.testing.assert_allclose(pos_c, pos_f, atol=1e-2, rtol=2e-4)
        np.testing.assert_allclose(sz_c, sz_f, atol=1e-2, rtol=2e-4)
        assert batch.roi_chunks == 4  # ceil(8 / 2)

    def test_roi_pipeline_matches_serial(self, setup):
        """Speculative pipelined dispatch (depth 2) must produce the
        same trajectories as the serial ROI loop up to ROI-origin f32
        noise — the speculative chunk's origin is anchored one chunk
        stale, which shifts the ROI-relative crop arithmetic ~1e-4
        relative but never changes which chunks are accepted."""
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=13)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]

        def make():
            batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                    canvas_w=W, batch=2, max_frames=32,
                                    chunk=3)
            videos = [(frames[0], np.array(centers[0], float),
                       np.array([48.0, 48.0]))] * 2
            return batch, batch.init_batch(videos, runner)

        fb = np.stack([np.stack(frames[1:])] * 2)
        nv = np.array([12, 12])
        roi = min(H, W) - 8

        batch, st = make()
        _, pos_s, sz_s, sc_s = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=roi, pipeline=False)

        batch, st = make()
        _, pos_p, sz_p, sc_p = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=roi, pipeline=True)
        np.testing.assert_allclose(pos_p, pos_s, atol=1e-2, rtol=2e-4)
        np.testing.assert_allclose(sz_p, sz_s, atol=1e-2, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_s),
                                   atol=5e-3)
        assert batch.roi_replays == 0

    def test_roi_escalation_converges(self, setup):
        """A hopeless initial ROI escalates (64 -> ... -> full-frame
        fallback) instead of replaying full frames forever, and the
        trajectory stays exact (replays + full-frame tail are the
        bit-identical full-frame program)."""
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=19)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]

        def make():
            batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                    canvas_w=W, batch=2, max_frames=32,
                                    chunk=3)
            videos = [(frames[0], np.array(centers[0], float),
                       np.array([48.0, 48.0]))] * 2
            return batch, batch.init_batch(videos, runner)

        fb = np.stack([np.stack(frames[1:])] * 2)
        nv = np.array([18, 18])

        batch, st = make()
        _, pos_f, sz_f, sc_f = batch.track_batch(st, fb, n_valid=nv)

        # search window is ~194 px for the 48-px target: the first
        # replay re-sizes straight to what the replayed trajectory
        # needed (>= 224), which holds the window — no blind ladder
        batch, st = make()
        _, pos_e, sz_e, sc_e = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=96, escalate=True)
        np.testing.assert_allclose(pos_e, pos_f, atol=1e-2)
        np.testing.assert_allclose(sz_e, sz_f, atol=1e-2)
        assert batch.roi_escalations >= 1
        # 224 holds the window; a wilder trajectory may climb higher,
        # but never stop short
        assert batch.roi_final >= 224
        # one replay per distinct failure mode, not a thrash: the r4
        # policy replayed 3/6 chunks on a mis-sized window (VERDICT r4
        # weak #1); the re-size-from-trajectory policy converges
        assert batch.roi_replays <= 2
        # telemetry: every dispatched chunk counts its wire bytes
        assert batch.roi_bytes_sent > 0
        assert batch.roi_bytes_full_equiv > 0
        # NOTE: roi_fallback may legitimately end True here — on this
        # 320-px canvas a random-weight size EMA can grow the window
        # past the 80%-of-canvas economic threshold, and handing off
        # is exactly what the cost policy is for.

    def test_suggest_roi_floors_at_init_span(self, setup):
        """A collapsed size EMA (lost target) must not shrink the
        suggested window below what the INIT-time target needs:
        under-sizing guarantees a full-frame replay, which costs more
        than the bytes the smaller window saves (the r5 chip A/B's
        192-vs-320 mis-size came exactly from this collapse)."""
        import jax.numpy as jnp
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=3)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]
        batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                canvas_w=W, batch=2, max_frames=32,
                                chunk=3)
        videos = [(frames[0], np.array(centers[0], float),
                   np.array([48.0, 48.0]))] * 2
        st = batch.init_batch(videos, runner)
        roi_init = batch.suggest_roi(st, chunk=2)

        # collapse the size EMA to a degenerate 4-px target
        st_lost = st._replace(sz=jnp.full_like(st.sz, 4.0))
        assert batch.suggest_roi(st_lost, chunk=2) == roi_init

        # a genuinely larger live target still grows the suggestion
        st_big = st._replace(sz=jnp.full_like(st.sz, 96.0))
        assert batch.suggest_roi(st_big, chunk=2) > roi_init

    def test_roi_escalation_full_frame_fallback(self, setup):
        """A target whose clipped search window spans the whole canvas
        can never be held by ANY sub-canvas ROI: escalation must hand
        the rest of the run to full frames (bit-identical program)."""
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=13)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]

        def make():
            batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                    canvas_w=W, batch=2, max_frames=32,
                                    chunk=3)
            # a 180-px init box: s_x > canvas, so the (image-clipped)
            # crop window spans the full frame every step
            videos = [(frames[0], np.array(centers[0], float),
                       np.array([180.0, 180.0]))] * 2
            return batch, batch.init_batch(videos, runner)

        fb = np.stack([np.stack(frames[1:])] * 2)
        nv = np.array([12, 12])

        batch, st = make()
        _, pos_f, sz_f, _ = batch.track_batch(st, fb, n_valid=nv)

        batch, st = make()
        _, pos_e, sz_e, _ = batch.track_batch_roi(
            st, fb, n_valid=nv, roi=160, escalate=True)
        # every ROI attempt replayed (exact) + full-frame tail (exact)
        np.testing.assert_allclose(pos_e, pos_f, atol=1e-5)
        np.testing.assert_allclose(sz_e, sz_f, atol=1e-5)
        assert batch.roi_final == min(H, W)
        assert batch.roi_escalations >= 1
        assert batch.roi_fallback, \
            "cost-based fallback must fire when no sub-canvas ROI works"


class TestMultiChipTracking:
    def test_mesh_sharded_matches_unsharded(self, setup):
        """Lockstep tracking sharded over an 8-device 'data' mesh must
        match the single-device engine (pure data parallelism: no
        collectives in the step)."""
        from usot_tpu.parallel.mesh import make_mesh
        from usot_tpu.tracker.engine import BatchScanEngine

        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=6)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        H, W = frames[0].shape[:2]
        fb = np.stack([np.stack(frames[1:])] * 8)
        nv = np.full(8, 5)
        videos = [(frames[0], np.array(centers[0], float),
                   np.array([48.0, 48.0]))] * 8

        plain = BatchScanEngine(model, variables, p, canvas_h=H,
                                canvas_w=W, batch=8, max_frames=16,
                                chunk=3)
        st = plain.init_batch(videos, runner)
        _, pos_p, sz_p, _ = plain.track_batch(st, fb, n_valid=nv)

        mesh = make_mesh(n_data=8)
        sharded = BatchScanEngine(model, variables, p, canvas_h=H,
                                  canvas_w=W, batch=8, max_frames=16,
                                  chunk=3, mesh=mesh)
        st = sharded.init_batch(videos, runner)
        _, pos_s, sz_s, _ = sharded.track_batch(st, fb, n_valid=nv)

        # SPMD compiles a per-device-batch program: f32 rounding shifts
        # by ~1e-6 relative vs the single-device program
        np.testing.assert_allclose(pos_s, pos_p, atol=2e-3)
        np.testing.assert_allclose(sz_s, sz_p, atol=2e-3)
