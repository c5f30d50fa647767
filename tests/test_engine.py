"""Scan-engine tests: mechanics + agreement with the parity tracker."""
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
        # With random (calibrated) weights the response map is noise, so the
        # argmax is chaotic: tiny f32-vs-f64 crop/postprocess differences can
        # flip the winning cell. Check the first-frame outputs agree loosely
        # and both paths stay well-behaved; checkpoint-level parity is what
        # pins exact agreement (BASELINE configs).
        err = np.linalg.norm(pos - ref_pos, axis=1)
        assert np.all(np.isfinite(err))
        assert err[0] < 130.0, (pos[0], ref_pos[0])  # within a search region
