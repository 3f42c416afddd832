"""Generate docs/RESULTS_ALL_RECORDS.md (BASELINE config 4: per-record
offline sweep results for every bundled MIT-BIH record) from the
f32-validation artifact (docs/f32_validation.json, produced by
tools/validate_f32.py — its f64 columns ARE the config-4 sweep: same
model, same flags as the reference's test_offline.py driver).

Usage: python tools/gen_results_table.py [--json docs/f32_validation.json]
"""

import argparse
import glob
import json
import os

GOLDENS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def _ref_match(rec, assignments):
    """Compare our f64 partition (from the arm assignment sidecar)
    against the committed reference golden for this record, if any.

    Returns 'exact' (identical member sets up to relabeling),
    'ARI=x.xxx' (golden exists but partitions differ), or None (no
    golden captured). Goldens are produced by
    tools/capture_ref_goldens.py from the RUNNING reference."""
    path = os.path.join(GOLDENS, f"rec{rec}_full_members_ref.json")
    if not os.path.exists(path):
        crash = os.path.join(GOLDENS, f"rec{rec}_ref_crash.json")
        if os.path.exists(crash):
            return "ref CRASHES (its own bug; we complete)"
        return None
    if assignments is None:
        return None
    import numpy as np
    with open(path) as f:
        g = json.load(f)
    ref = np.full(g["beats"], -1, np.int64)
    for m, idx in enumerate(g["member_sets"]):
        ref[idx] = m
    ours = np.asarray(assignments, np.int64)
    if ours.shape != ref.shape:
        return f"len {ours.shape[0]} vs ref {ref.shape[0]}"
    # label-permutation-invariant equality
    fwd, inv = {}, {}
    exact = all(
        fwd.setdefault(r, o) == o and inv.setdefault(o, r) == r
        for r, o in zip(ref.tolist(), ours.tolist()))
    if exact:
        return "exact"
    from hdpgpc_tpu.utils.eval import adjusted_rand_index
    return f"ARI={adjusted_rand_index(ours, ref):.3f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="docs/f32_validation.json")
    ap.add_argument("--out", default="docs/RESULTS_ALL_RECORDS.md")
    args = ap.parse_args()
    with open(args.json) as f:
        results = json.load(f)
    rows = sorted(results.items())
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    asg_path = os.path.splitext(args.json)[0] + "_assignments.npz"
    asg = {}
    if os.path.exists(asg_path):
        import numpy as np
        asg = dict(np.load(asg_path))
    lines = [
        "# Full MIT-BIH sweep — per-record offline results",
        "",
        "BASELINE config 4. Offline VI (reference test_offline.py flags:",
        "bayesian, warp off, lead 0, n_explore_steps=5,",
        "reestimate_initial_params) on every bundled record at FULL",
        "length, float64 exact-parity mode. Error = majority-label",
        "classification error (util_plots.print_results semantics,",
        "util_plots.py:269-299). Produced from the f32-validation runs",
        "(`tools/validate_f32.py`); regenerate with",
        "`python tools/gen_results_table.py`.",
        "",
        "| rec | beats | clusters | error | err rate | wall (s) | matches reference |",
        "|---|---|---|---|---|---|---|",
    ]
    tot_err = tot_beats = 0
    n_gold = n_exact = 0
    for key, r in rows:
        rec = key.split("@")[0]
        f64 = r["f64"]
        ref = _ref_match(rec, asg.get(f"{key}:f64"))
        if ref is not None:
            n_gold += 1
            n_exact += ref == "exact"
        lines.append(f"| {rec} | {f64['tot']} | {f64['M']} "
                     f"| {f64['err']}/{f64['tot']} "
                     f"| {f64['err'] / max(f64['tot'], 1):.4f} "
                     f"| {f64['sec']} | {ref or '—'} |")
        tot_err += f64["err"]
        tot_beats += f64["tot"]
    if rows:
        lines += ["",
                  f"**{len(rows)} records; total error {tot_err}/{tot_beats} "
                  f"({tot_err / max(tot_beats, 1):.4f}).**"]
        if n_gold:
            lines += [
                "",
                f"'matches reference' compares our f64 partition to the "
                f"RUNNING reference's final partition (goldens captured "
                f"via tools/capture_ref_goldens.py; member-set match up "
                f"to relabeling): **{n_exact}/{n_gold} captured records "
                f"match exactly.**"]
            lines += [
                "",
                "Note on rec 116, the one divergent row: our f64 run "
                "matches the reference's printed ELBO trajectory "
                "bit-for-bit through sweep 5 (-1021248.56 ... "
                "-836787.77); in sweep 6 the reference's birth search "
                "accepts nothing (assignments repeat, stop at M=4, "
                "final ELBO -836787.77) while ours accepts a birth and "
                "continues to M=7 at ELBO -718735.84 — a strictly "
                "better value of the model's own objective, with "
                "identical classification error 2/2411 on both sides. "
                "A near-threshold accept flip in one candidate "
                "evaluation, not a numerics fault: the 5-sweep prefix "
                "parity rides the reference's own determinism basis "
                "(GPI_HDP.py:15-27). Records 107/119: the reference "
                "aborts with an IndexError in its own reorder "
                "(GPI_HDP.py:1635) under its flagship configuration; "
                "crash transcripts are committed as goldens."]
        missing = 42 - len(rows)
        if missing > 0:
            lines += ["", f"({missing} records pending — the artifact is "
                          "regenerated as runs complete.)"]
    lines += [
        "",
        "Mesh-vs-sequential: `examples/run_all_records.py --mesh` runs the",
        "same per-record algorithm pinned one-record-per-device",
        "(`jax.default_device`), so outputs are identical to the",
        "sequential mode by construction; equality is asserted on the",
        "8-device virtual CPU mesh by",
        "tests/test_parallel.py::test_all_records_mesh_equals_sequential.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(rows)} records)")


if __name__ == "__main__":
    main()
