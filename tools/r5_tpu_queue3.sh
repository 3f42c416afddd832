#!/bin/bash
# Round-5 TPU queue, rev d. Two relay failure modes observed tonight:
# (1) a client starting in the same second as another client's exit
# wedges at 1 thread forever; (2) the wedge can persist minutes after
# an exit. So: gate each step with a probe client, THEN wait a settle
# period before the real job (the probe's own exit needs clearance
# too), and settle again after each job.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

gate() {
  for i in 1 2 3 4 5 6; do
    if timeout 420 python -c "import jax, jax.numpy as jnp; jnp.ones(3).sum().block_until_ready()" > /dev/null 2>&1; then
      echo "[gate] tunnel healthy (attempt $i) at $(date)"
      sleep 90
      return 0
    fi
    echo "[gate] probe hung (attempt $i), settling 120s"
    sleep 120
  done
  echo "[gate] tunnel unrecoverable"
  return 1
}

gate || exit 1
echo "[q3] growth stress 262144/K=64 at $(date)"
rm -f docs/stress_grow.jsonl
timeout 9000 python examples/run_stress_stream.py --grow \
  --beats 262144 --k 64 --log docs/stress_grow.jsonl \
  > /tmp/stress_grow.log 2>&1
echo "[q3] growth stress exit=$? at $(date)"
sleep 90

gate || exit 1
echo "[q3] fixed-K 1M stress at $(date)"
timeout 5400 python examples/run_stress_stream.py \
  --beats 1000000 --k 64 > /tmp/stress_fixed.log 2>&1
echo "[q3] fixed stress exit=$? at $(date)"
sleep 90

gate || exit 1
echo "[q3] bench variance x2 at $(date)"
timeout 4500 python tools/bench_variance.py 2 > /tmp/bench_var.log 2>&1
echo "[q3] bench variance exit=$? at $(date)"
sleep 90

gate || exit 1
echo "[q3] warm phase profile at $(date)"
timeout 2400 env HDPGPC_TIMING=1 HDPGPC_PROFILE_WARM=1 \
  HDPGPC_BENCH_ESTLIM=300 HDPGPC_BENCH_DTYPE=float32 \
  python tools/profile_offline.py > /tmp/profile_warm.log 2>&1
echo "[q3] profile exit=$? at $(date)"
sleep 90

gate || exit 1
echo "[q3] est600 subset arm at $(date)"
timeout 7200 python tools/validate_f32.py --arm f32 --est-limit 600 \
  --records 100,103,104,118,200,210,230,232 > /tmp/est600.log 2>&1
echo "[q3] est600 exit=$? at $(date)"

echo "[q3] ALL DONE at $(date)"
