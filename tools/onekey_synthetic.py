"""Full L1->L7 pipeline proof on synthetic data (VERDICT r2 #2).

Builds raw videos (moving textured square), then drives cli.onekey through
the COMPLETE chain as subprocesses:

  parse_flow (PWCLite flow -> DP pseudo boxes -> crop511 + train.json)
  -> cli.train (naive epoch + cycle-memory epoch, checkpoints)
  -> cli.test_epochs (benchmark runs per checkpoint)
  -> cli.evaluate (OPE)

and finally recomputes the OPE success in-process to report AUC as one
JSON line. The flow net is random-init (no ARFlow checkpoint ships in
this container), so parse_flow runs with --keep_all; the point is the
CHAIN — every stage consumes the real output of the previous one.

Usage: python tools/onekey_synthetic.py [--workdir var/onekey]
           [--videos 3] [--frames 16] [--samples 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_raw_videos(root: str, n_videos: int, n_frames: int,
                     h: int = 192, w: int = 256, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        vdir = os.path.join(root, f"video{v:02d}")
        os.makedirs(vdir, exist_ok=True)
        bg = (rng.random((h, w, 3)) * 80).astype(np.uint8)
        tex = (rng.random((48, 48, 3)) * 155 + 100).astype(np.uint8)
        x0, y0 = 20 + 10 * v, 30 + 8 * v
        dx, dy = 4 + v, 3
        for f in range(n_frames):
            im = bg.copy()
            x = min(x0 + dx * f, w - 49)
            y = min(y0 + dy * f, h - 49)
            im[y:y + 48, x:x + 48] = tex
            cv2.imwrite(os.path.join(vdir, f"{f:04d}.jpg"), im)


def build_benchmark(root: str, n_videos: int = 2, n_frames: int = 8,
                    size: int = 320, seed: int = 7):
    """OTB2015-layout synthetic benchmark: textured square on noise."""
    import cv2

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "OTB2015")
    meta = {}
    for v in range(n_videos):
        vid = f"Synth{v}"
        vdir = os.path.join(base, vid, "img")
        os.makedirs(vdir, exist_ok=True)
        tex = (rng.random((48, 48, 3)) * 155 + 100).astype(np.uint8)
        names, gt = [], []
        cx, cy = 100, 120
        for f in range(n_frames):
            im = (rng.random((size, size, 3)) * 60).astype(np.uint8)
            cx, cy = 100 + 5 * f, 120 + 3 * f
            im[cy - 24:cy + 24, cx - 24:cx + 24] = tex
            name = f"{f + 1:04d}.jpg"
            cv2.imwrite(os.path.join(vdir, name), im)
            names.append(name)
            gt.append([cx - 24 + 1, cy - 24 + 1, 48, 48])  # 1-indexed xywh
        meta[vid] = {"video_dir": vid, "init_rect": gt[0],
                     "img_names": [f"{vid}/img/{n}" for n in names],
                     "gt_rect": gt, "attr": []}
    with open(os.path.join(root, "OTB2015.json"), "w") as f:
        json.dump(meta, f)


def build_config(workdir: str, samples: int, mem_num: int = 2) -> str:
    import yaml

    prep = os.path.join(workdir, "prep")
    cfg = {"USOT": {
        "OUTPUT_DIR": os.path.join(workdir, "log"),
        "CHECKPOINT_DIR": os.path.join(workdir, "snapshot"),
        "WORKERS": 2,
        "PRINT_FREQ": 1,
        "PREPROCESS": {
            "ISTRUE": True,
            "DATA_DIR": os.path.join(workdir, "raw"),
            "OUTPUT_DIR": prep,
            "DATASET": "got10k",
            "KEEP_ALL": True,
            "INSTANCE_SIZE": 511,
        },
        "TRAIN": {
            "ISTRUE": True,
            "START_EPOCH": 5,   # checkpoints persist from epoch 5
            "END_EPOCH": 6,
            "BATCH": 2,
            "BATCH_STAGE_2": 2,
            "MEMORY_EPOCH": 6,  # epoch 5 naive, epoch 6 cycle-memory
            "UNFIX_EPOCH": 6,
            "MEMORY_NUM": mem_num,
            "PRETRAIN": "nonexistent.model",
            "WHICH_USE": ["GOT10K"],
        },
        "DATASET": {
            "GOT10K": {
                "PATH": os.path.join(prep, "crop511") + "/",
                "ANNOTATION": os.path.join(prep, "train.json"),
                "USE": samples,
            },
        },
        "TEST": {
            "ISTRUE": True,
            "DATA": "OTB2015",
            "START_EPOCH": 5,
            "END_EPOCH": 6,
            "DATASET_ROOT": os.path.join(workdir, "bench"),
            "RESULT_DIR": os.path.join(workdir, "result"),
            "ENGINE": "parity",
            "MEM_SIZE": mem_num,
        },
    }}
    path = os.path.join(workdir, "onekey.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run(workdir: str, n_videos: int = 3, n_frames: int = 16,
        samples: int = 8) -> dict:
    os.makedirs(workdir, exist_ok=True)
    build_raw_videos(os.path.join(workdir, "raw"), n_videos, n_frames)
    build_benchmark(os.path.join(workdir, "bench"))
    cfg_path = build_config(workdir, samples)

    from usot_tpu.cli.onekey import main as onekey_main
    onekey_main(["--cfg", cfg_path])

    # recompute OPE in-process for a machine-readable AUC
    from usot_tpu.cli.evaluate import evaluate
    result_root = os.path.join(workdir, "result", "OTB2015")
    trackers = sorted(os.listdir(result_root))
    out = evaluate("OTB2015", os.path.join(workdir, "bench"),
                   result_root, trackers)
    aucs = {t: float(np.mean([np.mean(v) for v in
                              out["success"][t].values()]))
            for t in trackers}
    stages = {}
    stage_path = os.path.join(workdir, "log", "onekey_stages.json")
    if os.path.exists(stage_path):
        with open(stage_path) as f:
            stages = json.load(f)
    summary = {"trackers": trackers, "auc": aucs,
               "max_auc": max(aucs.values()),
               "stage_seconds": stages}
    with open(os.path.join(workdir, "onekey_result.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="var/onekey")
    ap.add_argument("--videos", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--samples", type=int, default=8)
    args = ap.parse_args()
    summary = run(args.workdir, args.videos, args.frames, args.samples)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
