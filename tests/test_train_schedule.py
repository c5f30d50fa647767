"""Full staged-schedule execution + interrupt/resume continuation at toy
scale (ref: scripts/train_usot.py:324-361, experiments/train/USOT.yaml:8-51).

Drives cli.train.main through EVERY schedule transition in one run --
naive->cycle-memory (MEMORY_EPOCH), backbone unfreeze + optimizer rebuild
(UNFIX_EPOCH), warmup->log LR decay, lambda/cls_ratio shifts, checkpoint
persistence -- then replays an interrupted run (stops after a mid-schedule
epoch) and resumes it, asserting the resumed loss trajectory continues
IDENTICALLY to the unbroken run. Data comes from a prebuilt shard cache so
both runs consume byte-identical batches in the same order.
"""
import json
import os

import numpy as np
import pytest
import yaml

END_EPOCH = 8
MEMORY_EPOCH = 3
UNFIX_EPOCH = 5
INTERRUPT_AFTER = 6  # simulate a kill after this epoch's checkpoint


def _write_cfg(root, out_tag, crop_dir, ann_path, end_epoch=END_EPOCH):
    cfg = {
        "USOT": {
            "OUTPUT_DIR": str(root / out_tag / "log"),
            "CHECKPOINT_DIR": str(root / out_tag / "snapshot"),
            "WORKERS": 2,
            "PRINT_FREQ": 1,
            "TRAIN": {
                "WIDTH": 8,
                "CHANNELS": 32,
                "START_EPOCH": 1,
                "END_EPOCH": end_epoch,
                "BATCH": 2,
                "BATCH_STAGE_2": 2,
                "MEMORY_EPOCH": MEMORY_EPOCH,
                "UNFIX_EPOCH": UNFIX_EPOCH,
                "MEMORY_NUM": 2,
                "PRETRAIN": "nonexistent.model",
                "WHICH_USE": ["GOT10K"],
                "WARMUP": {
                    "IFNOT": True, "TYPE": "step", "EPOCH": 2,
                    "KWARGS": {"start_lr": 0.0025, "end_lr": 0.005,
                               "step": 1},
                },
                "LR": {"TYPE": "log",
                       "KWARGS": {"start_lr": 0.005, "end_lr": 0.0001}},
                "LAMBDA_SHIFT_EPOCHS": [0, 4, 6],
                "LAMBDA_1_LIST": [0.30, 0.275, 0.25],
                "CLS_RATIO_SHIFT_EPOCHS": [0, 4, 6],
                "CLS_RATIOS": [0.6, 0.5, 0.4],
            },
            "DATASET": {
                "GOT10K": {
                    "PATH": str(crop_dir) + "/",
                    "ANNOTATION": str(ann_path),
                    "USE": 4,
                },
            },
        }
    }
    path = root / f"{out_tag}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.fixture(scope="module")
def schedule_setup(tmp_path_factory):
    """Synthetic crop511 videos, train.json, and a shard cache for
    epochs 1..END_EPOCH (naive shards before MEMORY_EPOCH, cycle-memory
    shards from it on)."""
    import cv2

    root = tmp_path_factory.mktemp("full_schedule")
    crop_dir = root / "crop511"
    rng = np.random.default_rng(7)
    ann = {}
    n_frames = 12
    for v in ("vid_a", "vid_b"):
        vdir = crop_dir / v
        os.makedirs(vdir)
        track = {}
        for f in range(n_frames):
            im = (rng.random((511, 511, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(vdir / f"{f:06d}.00.x.jpg"), im)
            track[str(f)] = [200.0, 200.0, 310.0, 310.0, 0.9, 0.8,
                             max(0, f - 4), min(n_frames - 1, f + 4), 0.0]
        track["meta"] = {"bbox_picked_freq": 0.9, "corner_bbox_freq": 0.05}
        ann[v] = {"00": track}
    ann_path = root / "train.json"
    with open(ann_path, "w") as f:
        json.dump(ann, f)

    shards = root / "shards"
    cfg_path = _write_cfg(root, "shardcfg", crop_dir, ann_path)
    from usot_tpu.cli.make_shards import main as make_shards_main
    make_shards_main(["--cfg", cfg_path, "--out", str(shards),
                      "--epochs", f"1-{END_EPOCH}", "--samples", "4",
                      "--workers", "2"])
    return root, crop_dir, ann_path, str(shards)


def _run(root, tag, crop_dir, ann_path, shards, stop_after=None,
         resume=None):
    from usot_tpu.cli.train import main
    cfg_path = _write_cfg(root, tag, crop_dir, ann_path)
    argv = ["--cfg", cfg_path, "--devices", "1", "--shards", shards]
    if stop_after:
        # NOT a lowered END_EPOCH: that would rebuild the LR decay over
        # fewer epochs and change the trajectory being interrupted.
        argv += ["--stop-after-epoch", str(stop_after)]
    if resume:
        argv += ["--resume", resume]
    main(argv)
    with open(root / tag / "log" / "train_record.json") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def unbroken_run(schedule_setup):
    root, crop_dir, ann_path, shards = schedule_setup
    return _run(root, "full", crop_dir, ann_path, shards)


class TestFullSchedule:
    def test_every_epoch_executed(self, unbroken_run):
        epochs = unbroken_run["epochs"]
        assert sorted(map(int, epochs)) == list(range(1, END_EPOCH + 1))
        for rec in epochs.values():
            assert rec["n_iters"] == 2
            assert np.isfinite(rec["loss_avg"])

    def test_memory_transition(self, unbroken_run):
        epochs = unbroken_run["epochs"]
        for e in range(1, END_EPOCH + 1):
            assert epochs[str(e)]["cycle_memory"] == (e >= MEMORY_EPOCH), e

    def test_unfix_transition(self, unbroken_run):
        epochs = unbroken_run["epochs"]
        for e in range(1, END_EPOCH + 1):
            assert epochs[str(e)]["unfix"] == (e >= UNFIX_EPOCH), e

    def test_lr_trajectory_matches_spaces(self, unbroken_run):
        """Warmup (2 epochs step) then log decay, exactly as built by
        build_lr_spaces (ref: lib/utils/train_utils.py:186-323)."""
        from usot_tpu.config.defaults import load_config
        from usot_tpu.train.schedulers import build_lr_spaces

        cfg = load_config(None)
        tc = cfg.USOT.TRAIN
        tc.WARMUP.EPOCH = 2
        tc.LR.KWARGS = type(tc.LR.KWARGS)(start_lr=0.005, end_lr=0.0001)
        spaces = build_lr_spaces(tc, END_EPOCH)
        epochs = unbroken_run["epochs"]
        for e in range(1, END_EPOCH + 1):
            assert epochs[str(e)]["lr"] == pytest.approx(
                float(spaces[e - 1]), rel=1e-9), e
        # warmup rises, decay falls
        assert epochs["1"]["lr"] < epochs["2"]["lr"]
        assert epochs["4"]["lr"] > epochs[str(END_EPOCH)]["lr"]

    def test_lambda_and_ratio_shifts(self, unbroken_run):
        epochs = unbroken_run["epochs"]
        assert epochs["3"]["lambda_1"] == 0.30
        assert epochs["5"]["lambda_1"] == 0.275
        assert epochs["7"]["lambda_1"] == 0.25
        assert epochs["3"]["cls_ratio"] == 0.6
        assert epochs["5"]["cls_ratio"] == 0.5
        assert epochs["7"]["cls_ratio"] == 0.4

    def test_checkpoint_persistence_policy(self, schedule_setup,
                                           unbroken_run):
        """Reference semantics: persist only from epoch 5 on
        (ref: lib/utils/train_utils.py:82-84)."""
        root = schedule_setup[0]
        snap = root / "full" / "snapshot"
        for e in range(1, 5):
            assert not (snap / f"checkpoint_e{e}.ckpt").exists(), e
        for e in range(5, END_EPOCH + 1):
            assert (snap / f"checkpoint_e{e}.ckpt").exists(), e


@pytest.fixture(scope="module")
def interrupt_resume(schedule_setup):
    """An interrupted run (stops after INTERRUPT_AFTER) and its resumed
    continuation from the last checkpoint."""
    root, crop_dir, ann_path, shards = schedule_setup
    interrupted = _run(root, "interrupted", crop_dir, ann_path, shards,
                       stop_after=INTERRUPT_AFTER)
    ckpt = str(root / "interrupted" / "snapshot" /
               f"checkpoint_e{INTERRUPT_AFTER}.ckpt")
    resumed = _run(root, "resumed", crop_dir, ann_path, shards,
                   resume=ckpt)
    return interrupted, resumed, ckpt


class TestInterruptResume:
    def test_interrupted_prefix_matches(self, unbroken_run,
                                        interrupt_resume):
        interrupted, _, _ = interrupt_resume
        for e in range(1, INTERRUPT_AFTER + 1):
            assert interrupted["epochs"][str(e)]["losses"] == \
                unbroken_run["epochs"][str(e)]["losses"], e

    def test_resume_continues_identically(self, unbroken_run,
                                          interrupt_resume):
        """The resumed run must reproduce the unbroken run's remaining
        loss trajectory exactly — same shards, same programs, same
        restored (params, batch_stats, momentum)."""
        _, resumed, ckpt = interrupt_resume
        assert resumed["resumed_from"] == ckpt
        assert resumed["start_epoch"] == INTERRUPT_AFTER + 1
        assert sorted(map(int, resumed["epochs"])) == \
            list(range(INTERRUPT_AFTER + 1, END_EPOCH + 1))

        deltas = []
        for e in range(INTERRUPT_AFTER + 1, END_EPOCH + 1):
            a = np.array(unbroken_run["epochs"][str(e)]["losses"])
            b = np.array(resumed["epochs"][str(e)]["losses"])
            deltas.append(np.abs(a - b).max())
        assert max(deltas) <= 1e-6, f"resume drift: {deltas}"

    def test_resume_crosses_unfix_boundary(self, interrupt_resume):
        """Resuming past UNFIX_EPOCH must restore into the unfrozen
        optimizer structure (momentum buffers for backbone params), not
        START_EPOCH's frozen one — peek_epoch drives the rebuild."""
        _, _, ckpt = interrupt_resume
        from usot_tpu.train.checkpoint import peek_epoch
        assert peek_epoch(ckpt) == INTERRUPT_AFTER
        assert INTERRUPT_AFTER >= UNFIX_EPOCH  # the boundary is crossed
