"""Train a small USOT* on a synthetic trackable dataset (TPU).

Recreates round-1's end-to-end hardware validation as a reusable tool:
generates a crop511-style dataset of moving colored squares over noise,
runs the real training CLI (naive epochs then cycle-memory epochs), and
leaves checkpoints in var/synth_train/snapshot/. The resulting weights
actually track, which makes downstream measurements (bf16 drift,
trained-model fps) meaningful.

Usage: python tools/train_synthetic.py [--videos 24] [--samples 400]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_dataset(root, n_videos=24, n_frames=12, seed=0):
    import cv2

    crop_dir = os.path.join(root, "crop511")
    rng = np.random.default_rng(seed)
    ann = {}
    for v in range(n_videos):
        name = f"vid_{v:03d}"
        vdir = os.path.join(crop_dir, name)
        os.makedirs(vdir, exist_ok=True)
        base = (rng.random((511, 511, 3)) * 255).astype(np.uint8)
        color = rng.integers(60, 255, 3)
        size = int(rng.integers(60, 140))
        cx, cy = 255.0, 255.0  # crop511 layout centers the target
        track = {}
        for f in range(n_frames):
            im = base.copy()
            # mild appearance jitter so the tracker learns invariance
            jitter = rng.integers(-10, 10, 3)
            c = np.clip(color + jitter, 0, 255)
            x1 = int(cx - size / 2)
            y1 = int(cy - size / 2)
            im[y1:y1 + size, x1:x1 + size] = c
            cv2.imwrite(os.path.join(vdir, f"{f:06d}.00.x.jpg"), im)
            track[str(f)] = [cx - size / 2, cy - size / 2,
                             cx + size / 2, cy + size / 2, 0.9, 0.8,
                             max(0, f - 4), min(n_frames - 1, f + 4), 0.0]
        track["meta"] = {"bbox_picked_freq": 0.9, "corner_bbox_freq": 0.05}
        ann[name] = {"00": track}
    ann_path = os.path.join(root, "train.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return crop_dir, ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--end-epoch", type=int, default=7)
    ap.add_argument("--root", default="var/synth_train")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--channels", type=int, default=256)
    args = ap.parse_args()

    import yaml

    os.makedirs(args.root, exist_ok=True)
    crop_dir, ann_path = gen_dataset(args.root, args.videos)

    cfg = {
        "USOT": {
            "OUTPUT_DIR": os.path.join(args.root, "log"),
            "CHECKPOINT_DIR": os.path.join(args.root, "snapshot"),
            "WORKERS": 2,
            "PRINT_FREQ": 10,
            "TRAIN": {
                "WIDTH": args.width,
                "CHANNELS": args.channels,
                "START_EPOCH": 1,
                "END_EPOCH": args.end_epoch,
                "BATCH": args.batch,
                "BATCH_STAGE_2": max(2, args.batch // 2),
                "MEMORY_EPOCH": 6,      # cycle memory from epoch 6 (ref 6)
                "UNFIX_EPOCH": 3,
                "MEMORY_NUM": 2,
                "PRETRAIN": "nonexistent.model",
                "WHICH_USE": ["GOT10K"],
            },
            "DATASET": {
                "GOT10K": {
                    "PATH": crop_dir + "/",
                    "ANNOTATION": ann_path,
                    "USE": args.samples,
                },
            },
        }
    }
    cfg_path = os.path.join(args.root, "synth.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from usot_tpu.cli.train import main as train_main
    train_main(["--cfg", cfg_path, "--devices", "1"])
    print("checkpoints:", os.listdir(os.path.join(args.root, "snapshot")))


if __name__ == "__main__":
    main()
