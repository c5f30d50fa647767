"""One-key pipeline: train -> epoch-sweep test -> eval
(ref: scripts/onekey_usot.py)."""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="train+test+eval pipeline")
    p.add_argument("--cfg", default="experiments/train/USOT.yaml")
    p.add_argument("--dataset_dir", default="datasets_test")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)["USOT"]

    log_dir = cfg.get("OUTPUT_DIR", "var/log")
    os.makedirs(log_dir, exist_ok=True)

    if cfg["TRAIN"].get("ISTRUE", True):
        print("==> train")
        subprocess.run([sys.executable, "-m", "usot_tpu.cli.train",
                        "--cfg", args.cfg], check=True)

    if cfg["TEST"].get("ISTRUE", True):
        data = cfg["TEST"].get("DATA", "VOT2018")
        print("==> epoch sweep test on", data)
        subprocess.run([
            sys.executable, "-m", "usot_tpu.cli.test_epochs",
            "--start_epoch", str(cfg["TEST"].get("START_EPOCH", 10)),
            "--end_epoch", str(cfg["TEST"].get("END_EPOCH", 30)),
            "--dataset", data,
        ], check=True)

        print("==> eval")
        result_root = os.path.join("var/result", data)
        trackers = sorted(os.listdir(result_root)) if \
            os.path.isdir(result_root) else []
        if trackers:
            subprocess.run([
                sys.executable, "-m", "usot_tpu.cli.evaluate",
                "--dataset_dir", args.dataset_dir, "--dataset", data,
                "--tracker_result_dir", result_root,
                "--trackers", *trackers,
            ], check=False)


if __name__ == "__main__":
    main()
