"""End-to-end accuracy parity on hardware: optimized scan engine vs the
reference-parity tracker on a synthetic OTB-style benchmark, with the
trained checkpoint, through the REAL CLI loop (test CLI -> result files
-> OPE eval).

The scan engine runs the full optimized stack (bf16, fused Pallas
GroupDW, MXU matmul crop, batched lockstep); the parity tracker is the
host-loop float64-postprocess mirror of the reference. Close OPE
numbers = the optimizations don't change tracking decisions end to end.

Usage: python tools/accuracy_parity_run.py [--videos 6] [--frames 40]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_benchmark(root, n_videos, n_frames, size=360):
    import cv2

    base = os.path.join(root, "OTB2015")
    rng = np.random.default_rng(7)
    meta = {}
    for v in range(n_videos):
        vid = f"Syn{v:02d}"
        vdir = os.path.join(base, vid, "img")
        os.makedirs(vdir, exist_ok=True)
        noise = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        color = rng.integers(80, 255, 3).tolist()
        box = int(rng.integers(36, 64))
        x0, y0 = rng.integers(80, 140, 2)
        vx, vy = rng.uniform(1.0, 4.0, 2)
        names, gt = [], []
        for f in range(n_frames):
            im = noise.copy()
            cx = int(x0 + vx * f)
            cy = int(y0 + vy * f)
            im[cy - box // 2:cy + box // 2,
               cx - box // 2:cx + box // 2] = color
            name = f"{f + 1:04d}.jpg"
            cv2.imwrite(os.path.join(vdir, name), im)
            names.append(name)
            gt.append([cx - box // 2, cy - box // 2, box, box])
        meta[vid] = {"video_dir": vid, "init_rect": gt[0],
                     "img_names": [f"{vid}/img/{n}" for n in names],
                     "gt_rect": gt, "attr": []}
    with open(os.path.join(root, "OTB2015.json"), "w") as f:
        json.dump(meta, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--ckpt",
                    default="var/synth_train/snapshot/checkpoint_e7.ckpt")
    ap.add_argument("--root", default="var/parity_bench")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from usot_tpu.cli.evaluate import evaluate
    from usot_tpu.cli.test import main as test_main

    os.makedirs(args.root, exist_ok=True)
    build_benchmark(args.root, args.videos, args.frames)

    results = {}
    for engine, dtype, tag in (("parity", "float32", "USOT_parity"),
                               ("batch", "bfloat16", "USOT_scan")):
        test_main(["--dataset", "OTB2015",
                   "--dataset_root", args.root,
                   "--resume", args.ckpt,
                   "--engine", engine,
                   "--dtype", dtype,
                   "--batch", str(args.videos),
                   "--arch", tag,
                   "--result_dir", os.path.join(args.root, "result")])
        out = evaluate("OTB2015", args.root,
                       os.path.join(args.root, "result", "OTB2015"), [tag])
        auc = float(np.mean(list(out["success"][tag].values())))
        prec = float(np.mean(list(out["precision"][tag].values()),
                             axis=0)[20])
        results[tag] = (auc, prec)
        print(f"{tag}: AUC {auc:.4f}  precision@20 {prec:.4f}", flush=True)

    a = results["USOT_parity"]
    b = results["USOT_scan"]
    print(f"delta: AUC {abs(a[0]-b[0]):.4f}  precision {abs(a[1]-b[1]):.4f}")


if __name__ == "__main__":
    main()
