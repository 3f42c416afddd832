#!/bin/bash
# Round-5 serial TPU job queue: fires after the f32 arm sweep completes
# (the tunnel is effectively single-client, so TPU jobs must serialize).
# Each step logs to its own file under /tmp and writes its pid so it
# can be stopped individually.
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

# 1. wait for the f32 arm driver to exit
while kill -0 "$(cat /tmp/f32_arm.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "[queue] f32 arm done at $(date)"

# 2. 1M-beat / K=64 growth stress (BASELINE config 5; VERDICT ask #4)
rm -f docs/stress_1m.jsonl
echo "[queue] starting growth stress at $(date)"
timeout 9000 python examples/run_stress_stream.py --grow \
  --beats 1000000 --k 64 --log docs/stress_1m.jsonl \
  > /tmp/stress_1m.log 2>&1
echo "[queue] stress exit=$? at $(date)"

# 3. mesh scaling, real-chip batching regime (VERDICT ask #5)
echo "[queue] starting mesh scaling (tpu) at $(date)"
timeout 1800 python tools/measure_mesh_scaling.py \
  --out /tmp/mesh_tpu.md > /tmp/mesh_tpu.log 2>&1
echo "[queue] mesh tpu exit=$? at $(date)"

# 4. f64 exact mode on TPU via MP64, rec 100 (VERDICT ask #3)
echo "[queue] starting MP64 rec100 at $(date)"
timeout 1800 env HDPGPC_MP64=1 python tools/measure_f64_tpu.py \
  --records 100 > /tmp/mp64_100.log 2>&1
echo "[queue] mp64 rec100 exit=$? at $(date)"

# 5. bench variance band, 5 runs (VERDICT ask #7)
echo "[queue] starting bench variance at $(date)"
timeout 7200 python tools/bench_variance.py 5 > /tmp/bench_var.log 2>&1
echo "[queue] bench variance exit=$? at $(date)"

echo "[queue] ALL DONE at $(date)"
