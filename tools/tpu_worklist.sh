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
echo "DONE $(date)" >> $R/status
