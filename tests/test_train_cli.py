"""End-to-end training CLI smoke test: synthetic crop511 dataset -> one
naive-Siamese epoch -> checkpoint on disk. Exercises config plumbing, the
loader, the jitted step and checkpointing together."""
import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_train_setup(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("train_e2e")
    crop_dir = root / "crop511"
    rng = np.random.default_rng(0)
    ann = {}
    for v in ("vid_a", "vid_b"):
        vdir = crop_dir / v
        os.makedirs(vdir)
        track = {}
        for f in range(6):
            im = (rng.random((511, 511, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(vdir / f"{f:06d}.00.x.jpg"), im)
            track[str(f)] = [200.0, 200.0, 310.0, 310.0, 0.9, 0.8,
                             max(0, f - 2), min(5, f + 2), 0.0]
        track["meta"] = {"bbox_picked_freq": 0.9, "corner_bbox_freq": 0.05}
        ann[v] = {"00": track}
    with open(root / "train.json", "w") as f:
        json.dump(ann, f)

    cfg = {
        "USOT": {
            "OUTPUT_DIR": str(root / "log"),
            "CHECKPOINT_DIR": str(root / "snapshot"),
            "WORKERS": 2,
            "PRINT_FREQ": 1,
            "TRAIN": {
                "START_EPOCH": 5,   # >= 5 so the checkpoint is persisted
                "END_EPOCH": 5,
                "BATCH": 2,
                "BATCH_STAGE_2": 2,
                "MEMORY_EPOCH": 99,   # stay in the naive phase
                "UNFIX_EPOCH": 99,
                "MEMORY_NUM": 1,
                "PRETRAIN": "nonexistent.model",
                "WHICH_USE": ["GOT10K"],
            },
            "DATASET": {
                "GOT10K": {
                    "PATH": str(crop_dir) + "/",
                    "ANNOTATION": str(root / "train.json"),
                    "USE": 2,
                },
            },
        }
    }
    cfg_path = root / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(cfg_path)


def test_train_cli_one_epoch(tiny_train_setup):
    from usot_tpu.cli.train import main

    root, cfg_path = tiny_train_setup
    main(["--cfg", cfg_path, "--devices", "1"])

    ckpt = root / "snapshot" / "checkpoint_e5.ckpt"
    assert ckpt.exists(), "epoch-5 checkpoint must be written"

    # The checkpoint restores into a fresh state
    import jax
    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.train.checkpoint import restore_checkpoint
    from usot_tpu.train.optim import build_optimizer
    from usot_tpu.train.step import TrainState

    model = build_usot(mem_size=1)
    variables = init_variables(model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1, unfix=False)
    state = TrainState(variables["params"], variables["batch_stats"],
                       tx.init(variables["params"]))
    restored, epoch = restore_checkpoint(str(ckpt), state)
    assert epoch == 5
