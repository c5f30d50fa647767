import numpy as np
import jax
import pytest

from usot_tpu.models.calibrate import calibrate_batch_stats
from usot_tpu.models.usot import build_usot, init_variables
from usot_tpu.tracker.runner import ModelRunner
from usot_tpu.tracker.tracker import USOTTracker


def synthetic_video(n_frames=12, size=320, box=48, seed=0):
    """Moving bright square on noise; returns frames and gt center traj."""
    rng = np.random.default_rng(seed)
    frames, centers = [], []
    for f in range(n_frames):
        im = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cx = 100 + 6 * f
        cy = 120 + 3 * f
        im[cy - box // 2: cy + box // 2, cx - box // 2: cx + box // 2] = [
            200, 180, 60]
        frames.append(im)
        centers.append((cx, cy))
    return frames, centers


@pytest.fixture(scope="module")
def runner():
    model = build_usot(mem_size=2)
    variables = init_variables(model, jax.random.PRNGKey(1))
    variables = calibrate_batch_stats(model, variables, n_iter=10)
    return ModelRunner(model, variables)


class TestTrackerMechanics:
    def test_init_and_track(self, runner):
        frames, centers = synthetic_video()
        tracker = USOTTracker()
        pos = np.array(centers[0], dtype=np.float64)
        sz = np.array([48.0, 48.0])
        state = tracker.init(frames[0], pos, sz, runner)

        assert state["p"].instance_size in (255, 271)
        assert len(state["init_features"]) == 2
        assert state["init_features"][0].shape == (1, 7, 7, 256)

        for im in frames[1:6]:
            state = tracker.track(state, im)
            assert np.all(np.isfinite(state["target_pos"]))
            assert np.all(state["target_sz"] >= 10)
            assert 0 <= state["target_pos"][0] <= im.shape[1]
            assert 0 <= state["target_pos"][1] <= im.shape[0]

        # Memory queue grows one entry per tracked frame
        assert len(state["memory_features"]) == 6
        assert len(state["memory_confidences"]) == 6

    def test_memory_queue_assembly_lengths(self, runner):
        frames, centers = synthetic_video()
        tracker = USOTTracker()
        state = tracker.init(frames[0], np.array(centers[0], np.float64),
                             np.array([48.0, 48.0]), runner)
        p = state["p"]
        # 1 entry: fallback duplication path
        mem, scores = tracker._assemble_memory_queue(state, p)
        assert mem.shape[0] == p.mem_queue_size == len(scores)
        # many entries: segment sampling path
        state["memory_features"] = state["memory_features"] * 9
        state["memory_confidences"] = list(np.linspace(0.1, 0.9, 9))
        mem, scores = tracker._assemble_memory_queue(state, p)
        assert mem.shape[0] == p.mem_queue_size == len(scores)

    def test_big_sz_small_object(self, runner):
        frames, _ = synthetic_video(size=640, box=16)
        tracker = USOTTracker()
        state = tracker.init(frames[0], np.array([100.0, 120.0]),
                             np.array([16.0, 16.0]), runner)
        assert state["p"].instance_size == 271
        state = tracker.track(state, frames[1])
        assert np.all(np.isfinite(state["target_pos"]))
