"""Lockstep protocol tests: lane splice, VOT restart, lane refill.

Restart-structure assertions are made weight-independent by construction:
ground-truth rows are full-frame boxes (a clipped prediction ALWAYS
overlaps -> no spurious failure) except at forced-failure frames, where
the gt box lies outside the canvas (zero overlap with ANY prediction).
The restart skeleton (1 / 2 / 0 rows) must then be identical between the
lockstep batched path and the single-video scan path; bbox rows agree to
the usual batched-vs-single f32 tolerance."""
import os
from types import SimpleNamespace

import numpy as np
import jax
import pytest

from usot_tpu.models.calibrate import calibrate_batch_stats
from usot_tpu.models.usot import build_usot, init_variables
from usot_tpu.tracker.config import TrackerConfig
from usot_tpu.tracker.engine import BatchScanEngine, ScanEngine
from usot_tpu.tracker.runner import ModelRunner

from test_tracker import synthetic_video


@pytest.fixture(scope="module")
def setup():
    model = build_usot(mem_size=2)
    variables = init_variables(model, jax.random.PRNGKey(1))
    variables = calibrate_batch_stats(model, variables, n_iter=10)
    runner = ModelRunner(model, variables)
    return model, variables, runner


def small_config():
    p = TrackerConfig()
    p.instance_size = p.small_sz
    p.renew()
    p.sf_size = p.score_size
    return p


class TestSpliceLane:
    def test_spliced_lane_matches_fresh_engine(self, setup):
        """After splicing video C into lane 1 of a running batch, lane 1
        must track exactly like a freshly-initialized single-video scan
        engine on video C (restart semantics: ref scripts/test_usot.py
        re-enters tracker.init)."""
        model, variables, runner = setup
        frames_a, centers_a = synthetic_video(n_frames=7, seed=0)
        frames_c, centers_c = synthetic_video(n_frames=7, seed=5)
        H, W = frames_a[0].shape[:2]
        p = small_config()

        batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                canvas_w=W, batch=2, max_frames=32, chunk=3)
        videos = [(frames_a[0], np.array(centers_a[0], float),
                   np.array([48.0, 48.0]))] * 2
        st = batch.init_batch(videos, runner)
        # advance the batch a few frames so lane 1 has non-trivial state
        fb = np.stack([np.stack(frames_a[1:4])] * 2)
        st, _, _, _ = batch.track_batch(st, fb, n_valid=np.array([3, 3]))

        lane_st = batch.make_lane_state(
            frames_c[0], np.array(centers_c[0], float),
            np.array([48.0, 48.0]), runner)
        st = batch.splice_lane(st, 1, lane_st)
        fb2 = np.stack([np.stack(frames_a[4:]), np.stack(frames_c[1:4])])
        st, pos_b, sz_b, _ = batch.track_batch(
            st, fb2, n_valid=np.array([3, 3]))

        single = ScanEngine(model, variables, p, im_h=H, im_w=W,
                            max_frames=32, chunk=3)
        est = single.init_state(frames_c[0], np.array(centers_c[0], float),
                                np.array([48.0, 48.0]), runner)
        _, pos_s, sz_s, _ = single.track_frames(est, np.stack(frames_c[1:4]))

        np.testing.assert_allclose(pos_b[1], pos_s, atol=2e-3)
        np.testing.assert_allclose(sz_b[1], sz_s, atol=2e-3)

    def test_splice_lanes_matches_per_lane(self, setup):
        """Batched boundary splice (make_lane_states + splice_lanes) vs
        sequential single-lane splices: the untouched lane must be
        bit-identical, the respliced lanes equal within the usual
        batched-vs-single f32 tolerance (the batched path runs the
        group-shaped init passes instead of B=1 passes)."""
        model, variables, runner = setup
        frames_a, centers_a = synthetic_video(n_frames=7, seed=0)
        frames_c, centers_c = synthetic_video(n_frames=7, seed=5)
        frames_d, centers_d = synthetic_video(n_frames=7, seed=9)
        H, W = frames_a[0].shape[:2]
        p = small_config()

        def run(batched):
            eng = BatchScanEngine(model, variables, p, canvas_h=H,
                                  canvas_w=W, batch=3, max_frames=32,
                                  chunk=3)
            videos = [(frames_a[0], np.array(centers_a[0], float),
                       np.array([48.0, 48.0]))] * 3
            st = eng.init_batch(videos, runner)
            fb = np.stack([np.stack(frames_a[1:4])] * 3)
            st, _, _, _ = eng.track_batch(st, fb,
                                          n_valid=np.array([3, 3, 3]))
            fresh = [(frames_c[0], np.array(centers_c[0], float),
                      np.array([48.0, 48.0])),
                     (frames_d[0], np.array(centers_d[0], float),
                      np.array([40.0, 40.0]))]
            if batched:
                ls = eng.make_lane_states(fresh, runner)
                st = eng.splice_lanes(st, [1, 2], ls)
            else:
                for lane, (im, tp, ts) in zip((1, 2), fresh):
                    st = eng.splice_lane(
                        st, lane, eng.make_lane_state(im, tp, ts, runner))
            fb2 = np.stack([np.stack(frames_a[4:]),
                            np.stack(frames_c[1:4]),
                            np.stack(frames_d[1:4])])
            return eng.track_batch(st, fb2, n_valid=np.array([3, 3, 3]))

        _, pos_a, sz_a, _ = run(False)
        _, pos_b, sz_b, _ = run(True)
        np.testing.assert_array_equal(pos_a[0], pos_b[0])
        np.testing.assert_allclose(pos_b[1:], pos_a[1:], atol=2e-3)
        np.testing.assert_allclose(sz_b[1:], sz_a[1:], atol=2e-3)

    def test_splice_leaves_other_lanes_untouched(self, setup):
        model, variables, runner = setup
        frames, centers = synthetic_video(n_frames=7)
        H, W = frames[0].shape[:2]
        p = small_config()

        def run(with_splice):
            batch = BatchScanEngine(model, variables, p, canvas_h=H,
                                    canvas_w=W, batch=2, max_frames=32,
                                    chunk=3)
            videos = [(frames[0], np.array(centers[0], float),
                       np.array([48.0, 48.0]))] * 2
            st = batch.init_batch(videos, runner)
            if with_splice:
                lane_st = batch.make_lane_state(
                    frames[0], np.array([50.0, 50.0]),
                    np.array([30.0, 30.0]), runner)
                st = batch.splice_lane(st, 1, lane_st)
            fb = np.stack([np.stack(frames[1:])] * 2)
            return batch.track_batch(st, fb, n_valid=np.array([6, 6]))

        _, pos_a, sz_a, _ = run(False)
        _, pos_b, sz_b, _ = run(True)
        # lane 0 bit-identical; lane 1 diverges (different init)
        np.testing.assert_array_equal(pos_a[0], pos_b[0])
        assert not np.allclose(pos_a[1], pos_b[1])


def _forced_failure_video(n_frames, fail_frames, size=320, seed=0):
    """Synthetic video + gt rows engineered so the VOT protocol fails at
    EXACTLY fail_frames regardless of tracker behavior: normal frames
    carry a full-frame gt (always-overlapping), failure frames carry a
    gt outside the canvas (never-overlapping). Init rows (frame 0 and
    each restart frame f+5) carry the true target box."""
    frames, centers = synthetic_video(n_frames=n_frames, size=size,
                                      seed=seed)
    box = 48
    gt = []
    restarts = {f + 5 for f in fail_frames}
    for f in range(n_frames):
        if f == 0 or f in restarts:
            cx, cy = centers[f]
            gt.append([cx - box / 2, cy - box / 2, box, box])
        elif f in fail_frames:
            gt.append([size + 50.0, size + 50.0, 20.0, 20.0])
        else:
            gt.append([0.0, 0.0, float(size), float(size)])
    return frames, gt


def _region_skeleton(regions):
    return [x if isinstance(x, int) or x is None else "bbox"
            for x in regions]


class TestVOTRestartLockstep:
    @pytest.mark.parametrize("chunk,fails", [
        (8, ([2], [])),          # same-chunk restart + clean lane
        (4, ([3], [6])),         # cross-chunk await + second lane fails
    ])
    def test_matches_scan_protocol(self, setup, chunk, fails):
        from usot_tpu.cli.test import _scan_vot_loop
        from usot_tpu.tracker.lockstep import run_vot_group

        model, variables, runner = setup
        n = 16
        p = small_config()
        vids = []
        for vi, ff in enumerate(fails):
            frames, gt = _forced_failure_video(n, ff, seed=vi)
            vids.append((frames, gt))
        H, W = vids[0][0][0].shape[:2]
        b = len(vids)

        canvases = [np.stack(frames) for frames, _ in vids]
        hws = [(H, W)] * b
        gts = [gt for _, gt in vids]

        engine = BatchScanEngine(model, variables, p, canvas_h=H,
                                 canvas_w=W, batch=b, max_frames=64,
                                 chunk=chunk)
        results = run_vot_group(engine, runner, canvases, hws, gts,
                                p.instance_size, small_sz=p.small_sz,
                                big_sz=p.big_sz)

        args = SimpleNamespace(chunk=chunk)
        for vi in range(b):
            assert results[vi].spill_from is None
            frames, gt = vids[vi]
            regions = [None] * n
            engines = {}
            _scan_vot_loop(model, variables, runner, engines, args,
                           frames, canvases[vi], gt, regions, 0, True)
            # identical restart skeleton (forced by gt construction)
            assert _region_skeleton(results[vi].regions) \
                == _region_skeleton(regions), f"video {vi}"
            for f in range(n):
                a, s = results[vi].regions[f], regions[f]
                if not isinstance(a, int) and a is not None:
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(s), atol=5e-2,
                        err_msg=f"video {vi} frame {f}")

    def test_cli_vot_batched_writes_protocol_files(self, setup, tmp_path):
        """End-to-end through the CLI driver incl. result-file layout."""
        import cv2

        from usot_tpu.cli.test import track_dataset_vot_batched

        model, variables, runner = setup
        n = 10
        dataset = {}
        for vi in range(2):
            frames, gt = _forced_failure_video(n, [3] if vi == 0 else [],
                                               seed=vi)
            vdir = tmp_path / f"v{vi}"
            vdir.mkdir()
            files = []
            for f, im in enumerate(frames):
                fp = str(vdir / f"{f:04d}.png")
                cv2.imwrite(fp, im)
                files.append(fp)
            dataset[f"v{vi}"] = dict(name=f"v{vi}", image_files=files,
                                     gt=gt)
        args = SimpleNamespace(
            chunk=4, batch=2, epoch_test=False, resume="x",
            dataset="VOT2018", arch="USOT",
            result_dir=str(tmp_path / "result"))
        track_dataset_vot_batched(model, variables, runner, dataset, args)

        base = tmp_path / "result" / "VOT2018" / "USOT" / "baseline"
        lines = (base / "v0" / "v0_001.txt").read_text().splitlines()
        assert len(lines) == n
        assert lines[0] == "1"
        assert lines[3] == "2"            # forced failure at frame 3
        assert lines[4] == "0" and lines[7] == "0"
        assert lines[8] == "1"            # re-init at frame 8 (= 3+5)
        assert "," in lines[9]            # tracking resumes
        lines1 = (base / "v1" / "v1_001.txt").read_text().splitlines()
        assert lines1[0] == "1" and all("," in ln for ln in lines1[1:])


class TestLaneRefill:
    def test_refill_matches_single_and_covers_all(self, setup):
        """10:1-ish length skew, more videos than lanes: every video's
        trajectory must match its own single-video scan run, and lanes
        must actually be refilled."""
        from usot_tpu.tracker.lockstep import run_refill_group

        model, variables, runner = setup
        p = small_config()
        lengths = [13, 4, 4, 4]
        videos = []
        raw = []
        for vi, n in enumerate(lengths):
            frames, centers = synthetic_video(n_frames=n, seed=vi)
            raw.append((frames, centers))
            videos.append(dict(
                name=f"v{vi}", canvas=np.stack(frames),
                h=frames[0].shape[0], w=frames[0].shape[1],
                init_pos=np.array(centers[0], float),
                init_sz=np.array([48.0, 48.0])))
        H, W = raw[0][0][0].shape[:2]

        engine = BatchScanEngine(model, variables, p, canvas_h=H,
                                 canvas_w=W, batch=2, max_frames=32,
                                 chunk=4)
        results = run_refill_group(engine, runner, videos)

        single = ScanEngine(model, variables, p, im_h=H, im_w=W,
                            max_frames=32, chunk=4)
        for vi, n in enumerate(lengths):
            frames, centers = raw[vi]
            est = single.init_state(frames[0], np.array(centers[0], float),
                                    np.array([48.0, 48.0]), runner)
            _, pos_s, sz_s, _ = single.track_frames(est,
                                                    np.stack(frames[1:]))
            pos_r, sz_r, _ = results[f"v{vi}"]
            assert pos_r.shape == (n - 1, 2)
            np.testing.assert_allclose(pos_r, pos_s, atol=5e-2,
                                       err_msg=f"video {vi}")
            np.testing.assert_allclose(sz_r, sz_s, atol=5e-2,
                                       err_msg=f"video {vi}")
