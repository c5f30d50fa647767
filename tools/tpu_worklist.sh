#!/bin/bash
# Runs the TPU measurement battery serially once the chip responds.
cd /root/repo
R=/tmp/tpu_results
mkdir -p "$R"
# wait for tunnel (up to ~5h)
for i in $(seq 1 100); do
  if timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "tunnel up at $(date)" > $R/status
    break
  fi
  echo "wait $i $(date)" > $R/status
  sleep 180
done
timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1 || { echo "tunnel never returned" > $R/status; exit 1; }

echo "1: memops" >> $R/status
timeout 1800 python -u tools/bench_memops.py > $R/memops.log 2>&1
echo "memops exit=$?" >> $R/status

echo "2: xcorr" >> $R/status
timeout 1800 python -u tools/bench_xcorr.py --iters 20 > $R/xcorr.log 2>&1
echo "xcorr exit=$?" >> $R/status

echo "3: step attribution" >> $R/status
timeout 2400 python -u tools/microbench_step.py > $R/step.log 2>&1
echo "step exit=$?" >> $R/status

echo "4: bench.py" >> $R/status
timeout 3000 python bench.py > $R/bench.json 2> $R/bench.log
echo "bench exit=$?" >> $R/status

echo "5: accuracy parity (engine vs parity tracker, trained ckpt)" >> $R/status
timeout 3000 python -u tools/accuracy_parity_run.py > $R/parity.log 2>&1
echo "parity exit=$?" >> $R/status

# B re-sweep on the encoded-ring engine (the 20.4/26.4/43.5 ms sweep at
# B=32/40/64 predates the encoded-kernel carry; the ring footprint
# changed, so the lockstep sweet spot may have moved)
echo "6: bench B=48" >> $R/status
BENCH_BATCH=48 timeout 3000 python bench.py > $R/bench_b48.json 2> $R/bench_b48.log
echo "bench48 exit=$?" >> $R/status
echo "7: bench B=64" >> $R/status
BENCH_BATCH=64 timeout 3000 python bench.py > $R/bench_b64.json 2> $R/bench_b64.log
echo "bench64 exit=$?" >> $R/status

# ROI streaming through the tunnel: a 256px window is ~4.7x less link
# traffic than full 480x640 frames — can the tunnel-included figure
# beat the 58-fps reference baseline despite the ~25 MB/s link?
# chunk=16: the ROI window is revalidated per chunk — at the bench's
# 1.5 px/frame drift a 64-frame chunk moves ~96 px and would violate
# even a 384 ROI every time; 16 frames (~24 px) fit comfortably.
echo "8: bench ROI-320 streaming" >> $R/status
BENCH_ROI=320 BENCH_CHUNK=16 BENCH_MODE=stream BENCH_REPEATS=1 timeout 3000 python bench.py > $R/bench_roi.json 2> $R/bench_roi.log
echo "benchroi exit=$?" >> $R/status
echo "DONE $(date)" >> $R/status
