"""Generate docs/RESULTS_ALL_RECORDS.md (BASELINE config 4: per-record
offline sweep results for every bundled MIT-BIH record) from the
f32-validation artifact (docs/f32_validation.json, produced by
tools/validate_f32.py — its f64 columns ARE the config-4 sweep: same
model, same flags as the reference's test_offline.py driver).

Usage: python tools/gen_results_table.py [--json docs/f32_validation.json]
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="docs/f32_validation.json")
    ap.add_argument("--out", default="docs/RESULTS_ALL_RECORDS.md")
    args = ap.parse_args()
    with open(args.json) as f:
        results = json.load(f)
    rows = sorted(results.items())
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
        "| rec | beats | clusters | error | err rate | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    tot_err = tot_beats = 0
    for key, r in rows:
        rec = key.split("@")[0]
        f64 = r["f64"]
        lines.append(f"| {rec} | {f64['tot']} | {f64['M']} "
                     f"| {f64['err']}/{f64['tot']} "
                     f"| {f64['err'] / max(f64['tot'], 1):.4f} "
                     f"| {f64['sec']} |")
        tot_err += f64["err"]
        tot_beats += f64["tot"]
    if rows:
        lines += ["",
                  f"**{len(rows)} records; total error {tot_err}/{tot_beats} "
                  f"({tot_err / max(tot_beats, 1):.4f}).**"]
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
