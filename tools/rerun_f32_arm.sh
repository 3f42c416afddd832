#!/bin/bash
# Resumable driver for the round-5 f32 arm re-certification sweep
# (VERDICT r4 ask #1): re-run every record under the CURRENT Pallas
# binary with guard telemetry + solver stamp. A record counts as done
# once its arm entry carries the "solver" stamp (only r5 runs have it).
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
for attempt in 1 2 3 4 5 6; do
  REMAINING=$(python - <<'EOF'
import json, os
res = {}
if os.path.exists('docs/arm_f32.json'):
    res = json.load(open('docs/arm_f32.json'))
from hdpgpc_tpu.data.loader import list_records
todo = [r for r in list_records()
        if 'solver' not in res.get(f'{r}@full', {}).get('f32', {})]
print(','.join(todo))
EOF
)
  if [ -z "$REMAINING" ]; then
    echo "f32 arm: all records stamped — done."
    exit 0
  fi
  echo "=== attempt $attempt: $(echo $REMAINING | tr ',' '\n' | wc -l) records remaining: $REMAINING"
  python tools/validate_f32.py --arm f32 --force --records "$REMAINING"
  sleep 30
done
echo "f32 arm: attempts exhausted; check log."
exit 1
