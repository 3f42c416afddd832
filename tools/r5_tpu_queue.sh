#!/bin/bash
# Round-5 serial TPU job queue (v2). The tunnel is single-client AND
# sensitive to back-to-back client startups (two clients dialing within
# the same second can wedge the relay into a silent futex wait) — so
# every step is separated by a settle delay.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
SETTLE=120

if [ ! -f /tmp/r5_skip_stress ]; then
  # 1M-beat / K=64 growth stress (BASELINE config 5; VERDICT ask #4)
  rm -f docs/stress_1m.jsonl
  echo "[queue] starting growth stress at $(date)"
  timeout 10800 python examples/run_stress_stream.py --grow \
    --beats 1000000 --k 64 --log docs/stress_1m.jsonl \
    > /tmp/stress_1m.log 2>&1
  echo "[queue] stress exit=$? at $(date)"
  sleep $SETTLE
fi

# mesh scaling, real-chip batching regime (VERDICT ask #5)
echo "[queue] starting mesh scaling (tpu) at $(date)"
timeout 1800 python tools/measure_mesh_scaling.py \
  --out /tmp/mesh_tpu.md > /tmp/mesh_tpu.log 2>&1
echo "[queue] mesh tpu exit=$? at $(date)"
sleep $SETTLE

# f64 exact mode on TPU via MP64, rec 100 (VERDICT ask #3)
echo "[queue] starting MP64 rec100 at $(date)"
timeout 1800 env HDPGPC_MP64=1 python tools/measure_f64_tpu.py \
  --records 100 > /tmp/mp64_100.log 2>&1
echo "[queue] mp64 rec100 exit=$? at $(date)"
sleep $SETTLE

# phase profile for PERFORMANCE.md (VERDICT ask #7)
echo "[queue] starting phase profile at $(date)"
timeout 1800 env HDPGPC_TIMING=1 HDPGPC_BENCH_ESTLIM=300 \
  HDPGPC_BENCH_DTYPE=float32 python tools/profile_offline.py \
  > /tmp/profile_r5.log 2>&1
echo "[queue] profile exit=$? at $(date)"
sleep $SETTLE

# bench variance band, 5 runs (VERDICT ask #7)
echo "[queue] starting bench variance at $(date)"
timeout 7200 python tools/bench_variance.py 5 > /tmp/bench_var.log 2>&1
echo "[queue] bench variance exit=$? at $(date)"

echo "[queue] ALL DONE at $(date)"
