"""Run bench.py N times and report min/median/max of the headline
metrics (VERDICT r4 ask #7: a measured variance band next to the
speedup claim instead of 'one tunnel swing wide' adjectives).

Writes docs/bench_variance.json and prints a summary line.
"""

import json
import statistics
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
runs = []
for i in range(N):
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=3600)
    json_lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not json_lines:
        sys.stderr.write(f"run {i + 1}: bench.py rc={p.returncode}, no "
                         f"JSON line\nstderr tail:\n{p.stderr[-3000:]}\n")
        sys.exit(1)
    line = json_lines[-1]
    r = json.loads(line)
    runs.append(r)
    print(f"run {i + 1}/{N}: {r['value']} s/sweep "
          f"({r['vs_baseline']}x), online "
          f"{r.get('online_beats_per_sec', 'n/a')} "
          f"beats/s  [{time.time() - t0:.0f}s]", flush=True)

vals = [r["value"] for r in runs]
all_secs = [s for r in runs for s in r.get("runs_sec", [])]
onl = [r["online_beats_per_sec"] for r in runs
       if "online_beats_per_sec" in r]
out = {
    "n_runs": N,
    "offline_s_per_sweep": {"min": min(vals), "median":
                            statistics.median(vals), "max": max(vals)},
    "offline_all_timed_runs_sec": {
        "n": len(all_secs),
        "min": min(all_secs) if all_secs else None,
        "median": statistics.median(all_secs) if all_secs else None,
        "max": max(all_secs) if all_secs else None},
    "offline_vs_baseline": {"min": min(r["vs_baseline"] for r in runs),
                            "median": statistics.median(
                                r["vs_baseline"] for r in runs),
                            "max": max(r["vs_baseline"] for r in runs)},
    "online_beats_per_sec": ({"min": min(onl), "median":
                              statistics.median(onl), "max": max(onl)}
                             if onl else None),
    "metric": runs[0]["metric"],
    "runs": runs,
}
with open("docs/bench_variance.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
