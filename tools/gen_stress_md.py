"""Write docs/STRESS.md from the growth-stress JSONL log
(examples/run_stress_stream.py --grow --log docs/stress_1m.jsonl).

BASELINE config 5 artifact (VERDICT r3 ask #4 / r4 ask #4): 1M-beat /
K=64 long-horizon growth stress — throughput, final cluster count,
majority-mapped accuracy, peak RSS, constant-memory evidence.
"""

import json
import sys

log = sys.argv[1] if len(sys.argv) > 1 else "docs/stress_1m.jsonl"
out = sys.argv[2] if len(sys.argv) > 2 else "docs/STRESS.md"

entries = [json.loads(l) for l in open(log) if l.strip()]
done = [e for e in entries if e.get("event") == "done"]
prog = [e for e in entries if "beats" in e and e.get("event") != "done"]
assert done, "no 'done' event in the log — run incomplete"
d = done[-1]
rss = [e["peak_rss_mb"] for e in prog + [d] if "peak_rss_mb" in e]
bps = [e["beats_per_sec"] for e in prog if "beats_per_sec" in e]

lines = [
    "# Long-horizon growth stress — 1M beats / K=64 (BASELINE config 5)",
    "",
    "`python examples/run_stress_stream.py --grow --beats 1000000 --k 64"
    " --log docs/stress_1m.jsonl` on the real (tunnelled) v5e chip:",
    "the stream starts with ONE morphology and introduces a new one",
    f"every {d['beats'] // d['K']} beats; clusters are born ON DEVICE",
    "into preallocated slots (fused engine, models/stream_online.py),",
    "LDS updates freeze past the estimation limit (GPI_HDP.py:90",
    "semantics, exceeded scope: the reference has no streaming-scale",
    "driver), and the carry is a fixed K-slot bank.",
    "",
    f"| beats | K slots | clusters born | beats/s (steady) | accuracy "
    f"| wall (min) | peak RSS (MB) |",
    "|---|---|---|---|---|---|---|",
    f"| {d['beats']:,} | {d['K']} | {d['clusters_born']} "
    f"| {d['beats_per_sec']:,} | {d['accuracy']} | {d['minutes']} "
    f"| {d['peak_rss_mb']} |",
    "",
    f"Constant-memory evidence: host peak RSS over the run spans "
    f"{min(rss)}-{max(rss)} MB across {len(rss)} checkpoints "
    "(no growth with stream length; the device carry is O(K T^2) by "
    "construction).",
    "",
    f"Throughput trajectory (beats/s at each 256k-beat checkpoint): "
    f"{', '.join(str(b) for b in bps)}.",
    "",
    "Properties pinned at smoke scale by tests/test_stress_growth.py "
    "(constant carry shapes, on-device births, accuracy).",
]
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}")
