"""Digest the TPU measurement battery's logs (tools/tpu_worklist.sh ->
/tmp/tpu_results) into one summary block ready for PERF_NOTES.md.

Usage: python tools/process_battery.py [--dir /tmp/tpu_results]
"""
import argparse
import json
import os
import re


def read(d, name):
    p = os.path.join(d, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read()


def last_json_line(text):
    if not text:
        return None
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def bench_summary(d, stem):
    js = last_json_line(read(d, f"{stem}.json"))
    log = read(d, f"{stem}.log") or ""
    med = re.search(r"staged median ([\d.]+) fps", log)
    stream = re.search(r"streaming \(tunnel-included\): ([\d.]+) fps", log)
    roi = re.search(r"ROI-(\d+) streaming \(tunnel-included\): ([\d.]+) fps"
                    r" \((\d+)/(\d+) chunks replayed\)", log)
    out = []
    if js:
        out.append(f"metric {js['value']} {js['unit']} "
                   f"(vs_baseline {js['vs_baseline']}x)")
    if med:
        out.append(f"staged median {med.group(1)} fps")
    if stream:
        out.append(f"streaming {stream.group(1)} fps")
    if roi:
        out.append(f"ROI-{roi.group(1)} streaming {roi.group(2)} fps "
                   f"({roi.group(3)}/{roi.group(4)} chunks replayed)")
    return "; ".join(out) if out else "NO RESULT"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/tpu_results")
    args = ap.parse_args()
    d = args.dir

    print("== battery status ==")
    print((read(d, "status") or "missing").strip())

    print("\n== 1: memops (ring gather/write formulations) ==")
    memops = read(d, "memops.log") or ""
    for line in memops.splitlines():
        if re.search(r"gather=\S+\s+write=|correctness", line):
            print(line.rstrip())

    print("\n== 2: xcorr kernels (ms/iter) ==")
    xcorr = read(d, "xcorr.log") or ""
    for line in xcorr.splitlines():
        if re.search(r"ms/iter|--|FAILED", line):
            print(line.rstrip())

    print("\n== 3: step attribution (ms/iter) ==")
    step = read(d, "step.log") or ""
    for line in step.splitlines():
        if "ms/iter" in line:
            print(line.rstrip())

    print("\n== 4-8: headline benches ==")
    for stem, tag in (("bench", "B=32 default"), ("bench_b48", "B=48"),
                      ("bench_b64", "B=64"), ("bench_roi",
                                              "ROI-320 chunk=16 stream")):
        print(f"{tag:26s}: {bench_summary(d, stem)}")

    print("\n== 5: accuracy parity (engine vs parity tracker) ==")
    parity = read(d, "parity.log") or ""
    for line in parity.splitlines():
        if re.search(r"AUC|delta", line):
            print(line.rstrip())


if __name__ == "__main__":
    main()
