#!/bin/bash
# Round-5 TPU queue, part 2 (rev b): warm profile, right-sized growth
# stress, fixed-K 1M stress, bench variance (3 invocations x 3 timed
# runs = 9 samples), est600 policy subset.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
SETTLE=120

# wait for the in-flight single bench run
while kill -0 "$(cat /tmp/bench_var1.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
sleep $SETTLE

echo "[q2] warm phase profile at $(date)"
timeout 2400 env HDPGPC_TIMING=1 HDPGPC_PROFILE_WARM=1 \
  HDPGPC_BENCH_ESTLIM=300 HDPGPC_BENCH_DTYPE=float32 \
  python tools/profile_offline.py > /tmp/profile_warm.log 2>&1
echo "[q2] profile exit=$? at $(date)"
sleep $SETTLE

# growth stress, sized to the measured K=64 engine throughput so the
# run COMPLETES with a 'done' event on the single tunnelled chip
# (262144 beats = 4 blocks: one steady-state checkpoint + done)
echo "[q2] growth stress 262144/K=64 at $(date)"
rm -f docs/stress_grow.jsonl
timeout 9000 python examples/run_stress_stream.py --grow \
  --beats 262144 --k 64 --log docs/stress_grow.jsonl \
  > /tmp/stress_grow.log 2>&1
echo "[q2] growth stress exit=$? at $(date)"
sleep $SETTLE

# fixed-K classification stress at FULL 1M/K=64 scale
echo "[q2] fixed-K 1M stress at $(date)"
timeout 5400 python examples/run_stress_stream.py \
  --beats 1000000 --k 64 > /tmp/stress_fixed.log 2>&1
echo "[q2] fixed stress exit=$? at $(date)"
sleep $SETTLE

echo "[q2] bench variance x3 at $(date)"
timeout 5400 python tools/bench_variance.py 3 > /tmp/bench_var.log 2>&1
echo "[q2] bench variance exit=$? at $(date)"
sleep $SETTLE

# est-limit policy: est600 arm over a diverse subset (stable +
# est-divergent + dtype-divergent records) for the stability-doubling
# evaluation
echo "[q2] est600 subset arm at $(date)"
timeout 7200 python tools/validate_f32.py --arm f32 --est-limit 600 \
  --records 100,103,104,118,200,210,230,232 > /tmp/est600.log 2>&1
echo "[q2] est600 exit=$? at $(date)"

echo "[q2] ALL DONE at $(date)"
