"""Metric evaluation CLI (ref: lib/eval_toolkit/bin/eval.py).

Dispatch per dataset family:
  OTB / LaSOT / UAV / NFS -> OPE (success, precision, norm precision)
  VOT                     -> Accuracy-Robustness + EAO
  VOT-LT                  -> F1
"""
from __future__ import annotations

import argparse
from usot_tpu.eval.benchmarks import (AccuracyRobustnessBenchmark,
                                      EAOBenchmark, F1Benchmark, OPEBenchmark)
from usot_tpu.eval.datasets import create_dataset


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="tracking evaluation")
    parser.add_argument("--dataset_dir", type=str, help="dataset root")
    parser.add_argument("--dataset", type=str, help="dataset name")
    parser.add_argument("--tracker_result_dir", type=str,
                        help="tracker result root")
    parser.add_argument("--trackers", nargs="+")
    parser.add_argument("--vis", dest="vis", action="store_true")
    return parser.parse_args(argv)


def evaluate(dataset_name, dataset_dir, tracker_result_dir, trackers):
    dataset = create_dataset(dataset_name, dataset_dir)
    dataset.set_tracker(tracker_result_dir, trackers)

    if "VOT" in dataset_name and "LT" not in dataset_name:
        ar = AccuracyRobustnessBenchmark(dataset)
        ar_result = ar.eval(trackers)
        eao = EAOBenchmark(dataset)
        eao_result = eao.eval(trackers)
        ar.show_result(ar_result, eao_result)
        return {"ar": ar_result, "eao": eao_result}

    if "LT" in dataset_name:
        f1 = F1Benchmark(dataset)
        f1_result = f1.eval(trackers)
        f1.show_result(f1_result)
        return {"f1": f1_result}

    ope = OPEBenchmark(dataset)
    success = ope.eval_success(trackers)
    precision = ope.eval_precision(trackers)
    norm_precision = ope.eval_norm_precision(trackers)
    ope.show_result(success, precision, norm_precision)
    return {"success": success, "precision": precision,
            "norm_precision": norm_precision}


def main(argv=None):
    args = parse_args(argv)
    evaluate(args.dataset, args.dataset_dir, args.tracker_result_dir,
             args.trackers)


if __name__ == "__main__":
    main()
