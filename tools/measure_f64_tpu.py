"""Measure the f64 EXACT mode on the real TPU (VERDICT r4 ask #3).

Runs the flagship offline sweep (reference test_offline.py config,
warp off, lead 0, float64, NO estimation limit) on the TPU, per record,
and certifies the result three ways:

* wall time (target: rec 100 <= 93 s = the measured reference CPU
  wall; stretch: long-tail records under 600 s);
* partition vs the committed reference golden
  (tests/goldens/rec<rec>_full_members_ref.json), exact member-set
  match up to relabeling where a golden exists;
* partition vs our own f64 CPU arm (docs/arm_f64_assignments.npz) —
  the MP64 mixed-precision path (HDPGPC_MP64=1) must reproduce the
  plain-f64 partitions it accelerates.

Solver mode is stamped from the environment (HDPGPC_MP64). Results are
appended per record into docs/f64_tpu.json (resumable; --force
re-runs).

    HDPGPC_MP64=1 python tools/measure_f64_tpu.py --records 100,107,222
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _partition_matches_golden(rec, part):
    import numpy as np
    path = os.path.join(ROOT, "tests", "goldens",
                        f"rec{rec}_full_members_ref.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        g = json.load(f)
    ref = np.full(g["beats"], -1, np.int64)
    for m, idx in enumerate(g["member_sets"]):
        ref[idx] = m
    if ref.shape != part.shape:
        return f"len {part.shape[0]} vs {ref.shape[0]}"
    fwd, inv = {}, {}
    exact = all(fwd.setdefault(r, o) == o and inv.setdefault(o, r) == r
                for r, o in zip(ref.tolist(), part.tolist()))
    return "exact" if exact else "DIFFERS"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", default="100")
    ap.add_argument("--beats", type=int, default=None,
                    help="cap beats (smoke only; goldens are full-record)")
    ap.add_argument("--out", default="docs/f64_tpu.json")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    import numpy as np
    from tools.validate_f32 import _atomic_json, _load_json, run_one
    from hdpgpc_tpu.ops import linalg
    from hdpgpc_tpu.utils.eval import adjusted_rand_index

    mode = "mp64" if linalg.mp64_enabled() else "plain_f64"
    results = _load_json(args.out)
    arm_asg = {}
    arm_path = os.path.join(ROOT, "docs", "arm_f64_assignments.npz")
    if os.path.exists(arm_path):
        arm_asg = dict(np.load(arm_path))

    for rec in args.records.split(","):
        key = f"{rec}@{mode}" + (f"@{args.beats}" if args.beats else "")
        if key in results and not args.force:
            print(f"{key}: done", flush=True)
            continue
        t0 = time.time()
        r, part = run_one(rec, args.beats, "float64")
        r["wall_s"] = round(time.time() - t0, 1)
        r["solver_mode"] = mode
        part = np.asarray(part, np.int64)
        gm = (None if args.beats
              else _partition_matches_golden(rec, part))
        if gm is not None:
            r["vs_reference_golden"] = gm
        akey = f"{rec}@full:f64"
        if akey in arm_asg and not args.beats:
            cpu = np.asarray(arm_asg[akey], np.int64)
            fwd, inv = {}, {}
            same = (cpu.shape == part.shape and all(
                fwd.setdefault(c, o) == o and inv.setdefault(o, c) == c
                for c, o in zip(cpu.tolist(), part.tolist())))
            r["vs_cpu_f64_arm"] = ("exact" if same else
                                   f"ARI={adjusted_rand_index(cpu, part):.4f}")
        results[key] = r
        _atomic_json(args.out, results)
        print(f"[{mode}] rec {rec}: M {r['M']} err {r['err']}/{r['tot']} "
              f"{r['sec']}s on {r['platform']}"
              + (f" | vs ref golden: {gm}" if gm else "")
              + (f" | vs cpu f64 arm: {r.get('vs_cpu_f64_arm')}"
                 if "vs_cpu_f64_arm" in r else ""), flush=True)


if __name__ == "__main__":
    main()
