"""One-key pipeline: preprocess -> train -> epoch-sweep test -> eval
(ref: scripts/onekey_usot.py:29-66; preprocessing chain: scripts/
preprocessing/parse_<dataset>.py -> par_crop -> gen_json).

Each stage is a subprocess of the corresponding CLI, driven by one YAML
config, so the whole L1->L7 chain (raw videos -> flow pseudo-boxes ->
crop511/train.json -> training -> benchmark runs -> AUC) is a single
command. Stages toggle via ISTRUE flags like the reference.

Config keys used (all under USOT:):
  PREPROCESS: ISTRUE, DATA_DIR, OUTPUT_DIR, DATASET [, MAX_FRAMES, LIMIT,
              INSTANCE_SIZE]
  TRAIN:      ISTRUE (plus the normal training keys; point
              DATASET.<X>.PATH/ANNOTATION at PREPROCESS.OUTPUT_DIR)
  TEST:       ISTRUE, DATA, START_EPOCH, END_EPOCH [, DATASET_ROOT,
              RESULT_DIR, ENGINE, MEM_SIZE, PROCESSES]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import yaml

# Per-stage wall-clock seconds of the last main() run (also written to
# <OUTPUT_DIR>/onekey_stages.json) — the machine-readable record of the
# L1->L7 chain (ref: scripts/onekey_usot.py logs stage boundaries).
STAGE_TIMES: dict = {}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="preprocess+train+test+eval")
    p.add_argument("--cfg", default="experiments/train/USOT.yaml")
    p.add_argument("--dataset_dir", default="datasets_test",
                   help="benchmark root for evaluation (overridden by "
                   "TEST.DATASET_ROOT)")
    return p.parse_args(argv)


def _run(cmd, stage=None):
    print("==>", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True)
    if stage:
        STAGE_TIMES[stage] = round(time.perf_counter() - t0, 3)


def main(argv=None):
    args = parse_args(argv)
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)["USOT"]

    log_dir = cfg.get("OUTPUT_DIR", "var/log")
    os.makedirs(log_dir, exist_ok=True)

    pre = cfg.get("PREPROCESS", {})
    if pre.get("ISTRUE", False):
        cmd = [sys.executable, "-m", "usot_tpu.cli.parse_flow",
               "--data_dir", pre["DATA_DIR"],
               "--output_dir", pre["OUTPUT_DIR"],
               "--dataset", pre.get("DATASET", "got10k")]
        for key, flag in (("MAX_FRAMES", "--max_frames"),
                          ("LIMIT", "--limit"),
                          ("INSTANCE_SIZE", "--instance_size")):
            if key in pre:
                cmd += [flag, str(pre[key])]
        if pre.get("KEEP_ALL", False):
            cmd.append("--keep_all")
        _run(cmd, stage="preprocess")

    if cfg["TRAIN"].get("ISTRUE", True):
        _run([sys.executable, "-m", "usot_tpu.cli.train",
              "--cfg", args.cfg], stage="train")

    test = cfg.get("TEST", {})
    if test.get("ISTRUE", True):
        data = test.get("DATA", "VOT2018")
        result_dir = test.get("RESULT_DIR", "var/result")
        cmd = [sys.executable, "-m", "usot_tpu.cli.test_epochs",
               "--start_epoch", str(test.get("START_EPOCH", 10)),
               "--end_epoch", str(test.get("END_EPOCH", 30)),
               "--dataset", data,
               "--snapshot_dir", cfg.get("CHECKPOINT_DIR", "var/snapshot"),
               "--result_dir", result_dir,
               "--processes", str(test.get("PROCESSES", 1))]
        for key, flag in (("DATASET_ROOT", "--dataset_root"),
                          ("ENGINE", "--engine"),
                          ("MEM_SIZE", "--mem_size")):
            if key in test:
                cmd += [flag, str(test[key])]
        _run(cmd, stage="test_epochs")

        result_root = os.path.join(result_dir, data)
        trackers = sorted(os.listdir(result_root)) if \
            os.path.isdir(result_root) else []
        if trackers:
            # Tolerate eval failures (e.g. a stale/partial tracker dir
            # from an earlier killed run): the train + per-epoch test
            # results above are already complete and on disk, matching
            # the reference one-key behavior of not gating on eval.
            try:
                _run([sys.executable, "-m", "usot_tpu.cli.evaluate",
                      "--dataset_dir", test.get("DATASET_ROOT",
                                                args.dataset_dir),
                      "--dataset", data,
                      "--tracker_result_dir", result_root,
                      "--trackers", *trackers], stage="evaluate")
            except subprocess.CalledProcessError as e:
                print(f"onekey: evaluate stage failed (rc={e.returncode});"
                      " train/test results are intact", file=sys.stderr)

    with open(os.path.join(log_dir, "onekey_stages.json"), "w") as f:
        json.dump(STAGE_TIMES, f, indent=1)


if __name__ == "__main__":
    main()
