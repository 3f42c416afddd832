"""Capture reference-final-partition goldens for many MIT-BIH records.

VERDICT r4 ask #6: reference-side per-record parity evidence beyond
records 100/102. Runs the ACTUAL reference implementation (read-only
at /root/reference, imported via the tools/refstubs shims with the
exact-mechanics kernel-fit replacement — the same machinery behind
tests/goldens/rec100_full_members_ref.json and
tests/test_reference_parity.py) on the full record in the flagship
test_offline.py configuration (reference tests/test_offline.py:68-87:
bayesian_params=True, reestimate_initial_params=True,
n_explore_steps=5, warp off, lead 0) and commits one golden JSON per
record under tests/goldens/.

Our side is NOT run here — the committed docs/arm_f64 artifacts hold
the framework's f64 exact partitions, and tools/gen_results_table.py
compares the two into the "matches reference" column of
docs/RESULTS_ALL_RECORDS.md. tests/test_reference_parity.py sweeps the
same goldens live (opt-in, HDPGPC_RUN_FULL_GOLDEN=1).

Resumable: one JSON per record, skipped when present.

    python tools/capture_ref_goldens.py --records 104,107,119,200
"""

import argparse
import contextlib
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/hdpgpc"
GOLDENS = os.path.join(ROOT, "tests", "goldens")

sys.path.insert(0, os.path.join(ROOT, "tools"))
sys.path.insert(0, ROOT)
sys.path.insert(0, REF)


def run_reference(rec):
    import numpy as np
    from refstubs.install import install, patch_fit_torch
    install()
    import hdpgpc.GPI_HDP as hdpgp
    patch_fit_torch()
    sys.path.insert(0, os.path.join(ROOT))
    from hdpgpc_tpu.data.priors import compute_estimators_lds

    data = np.load(os.path.join(REF, f"data/mitbih/{rec}.npy"))[:, :, [0]]
    std, std_dif, bs, bg = compute_estimators_lds(data)
    N, T, L = data.shape
    x_basis = np.atleast_2d(np.arange(0, T, 1, dtype=np.float64)).T
    x_train = np.atleast_2d(np.arange(0, T, dtype=np.float64)).T
    x_trains = np.array([x_train] * N)
    nw = std * 0.1
    sw = hdpgp.GPI_HDP(
        x_basis, x_basis_warp=np.atleast_2d(
            np.arange(0, T, 2, dtype=np.float64)).T,
        n_outputs=L, ini_lengthscale=3.0, bound_lengthscale=(1.0, 20.0),
        ini_gamma=std_dif, ini_sigma=std, ini_outputscale=300.0,
        noise_warp=nw, bound_sigma=bs, bound_gamma=bg,
        bound_noise_warp=(nw * 0.1, nw * 0.2), verbose=False,
        hmm_switch=True, max_models=100, bayesian_params=True,
        reestimate_initial_params=True, n_explore_steps=5, free_deg_MNIV=5)
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        sw.include_batch(x_trains, data, warp=False)
    wall = time.time() - t0
    member_sets = [sorted(int(i) for i in g.indexes)
                   for g in sw.gpmodels[0]]
    return {
        "record": rec, "beats": int(N), "lead": 0,
        "config": "test_offline.py flagship (bayesian, warp off)",
        "wall_s": round(wall, 1),
        "train_elbo": [float(e) for e in sw.train_elbo],
        "member_sets": member_sets,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", required=True,
                    help="comma-separated record ids")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    for rec in args.records.split(","):
        out = os.path.join(GOLDENS, f"rec{rec}_full_members_ref.json")
        crash = os.path.join(GOLDENS, f"rec{rec}_ref_crash.json")
        if (os.path.exists(out) or os.path.exists(crash)) \
                and not args.force:
            print(f"{rec}: golden/crash record exists", flush=True)
            continue
        t0 = time.time()
        try:
            g = run_reference(rec)
        except Exception as e:  # the reference has record-dependent
            # crashes of its own (e.g. rec 107: IndexError at
            # GPI_HDP.py:1635, reorder index past the warped-y buffer);
            # record the fact — "our framework completes where the
            # reference aborts" is itself parity evidence worth keeping
            import traceback
            note = {"record": rec, "error": repr(e),
                    "where": traceback.format_exc().splitlines()[-3:],
                    "config": "test_offline.py flagship (bayesian, "
                              "warp off)"}
            with open(crash, "w") as f:
                json.dump(note, f, indent=1)
            print(f"{rec}: REFERENCE CRASHED ({e!r}) -> {crash}",
                  flush=True)
            continue
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(g, f)
        os.replace(tmp, out)
        print(f"{rec}: M={len(g['member_sets'])} beats={g['beats']} "
              f"wall={g['wall_s']}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
