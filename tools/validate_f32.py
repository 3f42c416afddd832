"""f32 speed-mode structural validation across the bundled MIT-BIH records.

VERDICT r2 weakness #3 / r3 ask #1: the float32 speed mode (internal
amplitude normalisation, compute_dtype="float32") is quality-gated by
the rec-100 classification error; this tool quantifies its *structural*
fidelity against the float64 exact-parity mode on every bundled record:
per record it runs the offline VI sweep (reference test_offline.py
configuration, warp off — GPI_HDP.py:805 semantics) in both dtypes and
reports cluster count, classification error, and the adjusted Rand
index between the two hard partitions.

The two arms can run as SEPARATE PROCESSES on separate platforms (the
f64 exact arm is faster on the host CPU than on a v5e, which has no
native f64; the f32 arm is TPU-bound), each writing its own artifact:

  python tools/validate_f32.py --arm f64 --platform cpu   # background
  python tools/validate_f32.py --arm f32                  # on TPU
  python tools/validate_f32.py --merge                    # combine + md

Each arm is resumable (one JSON entry + assignment sidecar per record,
written atomically per record), so a dropped TPU tunnel only costs the
in-flight record. ``--merge`` folds the arms plus the legacy combined
artifact into docs/f32_validation.json, computes ARIs, runs any
missing divergence-factoring f64+est arms for ARI<0.8 records, and
regenerates docs/F32_VALIDATION.md. The per-record f64 sweep table
(docs/RESULTS_ALL_RECORDS.md) is generated from the same combined
artifact by tools/gen_results_table.py.

Legacy single-process mode (no --arm/--merge) still runs both arms
inline, as in round 3.
"""

import argparse
import contextlib
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _atomic_json(path, obj):
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _atomic_npz(path, arrays):
    import numpy as np
    d = os.path.dirname(os.path.abspath(path))
    # suffix .npz so numpy writes to the temp name itself (it appends
    # .npz to any other name, which would leave the mkstemp stub behind)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def _load_json(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _load_npz(path):
    if os.path.exists(path):
        import numpy as np
        return dict(np.load(path))
    return {}


def assignments(model):
    """Per-beat hard cluster id from the model's member sets."""
    import numpy as np
    member_idx = model.member_indexes()
    out = np.full(model.T_count, -1, np.int64)
    for m, idx in enumerate(member_idx):
        for i in idx:
            out[i] = m
    return out


def run_one(rec, beats, dtype, est_limit=None):
    import numpy as np

    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import classification_error

    data, labels = load_record(rec, lead=0)
    if beats:
        data, labels = data[:beats], labels[:beats]
    std, std_dif, bs, bg = compute_estimators_lds(data)
    N, T, L = data.shape
    x = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    m = HDPGPC(default_x_basis(T), n_outputs=L, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=300.0, bound_sigma=bs,
               bound_gamma=bg, reestimate_initial_params=True,
               n_explore_steps=5, compute_dtype=dtype,
               estimation_limit=est_limit)
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        m.include_batch(x, data, with_warp=False)
    err, tot = classification_error(m, labels, 0)
    import jax
    r = {"M": int(m.M), "err": int(err), "tot": int(tot),
         "sec": round(time.time() - t0, 1),
         "platform": jax.default_backend()}
    if dtype == "float32":
        # stamp the solver backend the run actually used, so the table
        # certifies the shipped binary (the batched Pallas kernel vs
        # the XLA solves it replaced)
        from hdpgpc_tpu.ops.pallas.chol_solve import pallas_solves_enabled
        r["solver"] = ("pallas_batched" if pallas_solves_enabled()
                       else "xla")
        # f32 fragility guard telemetry (config.f32_guard_tol): the
        # per-record signal bench.py's quality gate keys on
        mrm = m.f32_min_rel_margin
        r["guard_min_rel_margin"] = (None if mrm == float("inf")
                                     else float(f"{mrm:.3e}"))
        r["guard_fragile"] = bool(m.f32_fragile)
    return r, assignments(m)


def write_md(results, path, est=300):
    rows = sorted(results.items())
    lines = [
        f"# float32 speed-mode structural validation (est{est})",
        "",
        "Per bundled MIT-BIH record: offline VI (reference test_offline.py",
        "configuration, lead 0, warp off) run in float64 (exact-parity mode,",
        "no estimation limit) and the float32 TPU speed mode",
        f"(internal amplitude normalisation + estimation_limit={est}"
        + (" — the exact bench.py configuration the headline speedup"
           " rides on)." if est == 300 else ")."),
        "ARI = adjusted Rand index between the two final hard partitions",
        "(1.0 = identical member sets up to relabeling). Produced by",
        "`tools/validate_f32.py`; artifact `docs/f32_validation.json`.",
        "",
        "Where ARI < 0.8 the divergence is factored into its two causes:",
        f"`est eff` = ARI(f64 exact, f64+est{est}) — the estimation-limit",
        "CONFIG effect, present in the reference under the same knob",
        f"(GPI_HDP.py:90) — and `dtype eff` = ARI(f64+est{est}, "
        f"f32+est{est}),",
        "the pure float32 fidelity the speed mode answers for.",
        "",
        "`guard` = the f32 fragility guard's verdict for the f32 run",
        "(models/hdpgpc.py `f32_fragile`: narrowest structural",
        "accept/reject decision margin < config.f32_guard_tol).",
        "bench.py's quality gate rejects flagged runs; a user gets the",
        "flag on the model and should re-run that record in f64.",
        "",
    ]
    solvers = sorted({r["f32"].get("solver", "unstamped (pre-r5 run)")
                      for _k, r in rows if "f32" in r})
    platforms = sorted({r["f32"].get("platform", "?")
                        for _k, r in rows if "f32" in r})
    lines += [
        f"f32 solver backend: {', '.join(solvers)} on "
        f"{', '.join(platforms)} (stamped per record in the JSON "
        "artifact — the table certifies the binary bench.py ships).",
        "",
        "| rec | beats | M f64 | M f32 | err f64 | err f32 | ARI | est eff | dtype eff | guard | s f64 | s f32 |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    n = 0
    ari_sum = 0.0
    err64 = err32 = tot = 0
    for key, r in rows:
        if "f64" not in r or "f32" not in r or "ari" not in r:
            continue
        rec = key.split("@")[0]
        ee = (f"{r['ari_est_effect']:.3f}" if "ari_est_effect" in r
              else "—")
        de = (f"{r['ari_dtype_effect']:.3f}" if "ari_dtype_effect" in r
              else "—")
        if "guard_fragile" in r["f32"]:
            guard = "FLAG" if r["f32"]["guard_fragile"] else "ok"
        else:
            guard = "—"
        lines.append(
            f"| {rec} | {r['beats']} | {r['f64']['M']} | {r['f32']['M']} "
            f"| {r['f64']['err']}/{r['f64']['tot']} "
            f"| {r['f32']['err']}/{r['f32']['tot']} "
            f"| {r['ari']:.4f} | {ee} | {de} | {guard} "
            f"| {r['f64']['sec']} | {r['f32']['sec']} |")
        n += 1
        ari_sum += r["ari"]
        err64 += r["f64"]["err"]
        err32 += r["f32"]["err"]
        tot += r["f64"]["tot"]
    if n:
        dtype_effs = [r.get("ari_dtype_effect") for _k, r in rows]
        dtype_effs = [d for d in dtype_effs if d is not None]
        lines += [
            "",
            f"**{n} records; mean ARI {ari_sum / n:.4f}; total error "
            f"f64 {err64}/{tot} ({err64 / max(tot, 1):.4f}) vs "
            f"f32 {err32}/{tot} ({err32 / max(tot, 1):.4f}).**",
        ]
        if dtype_effs:
            lines += [
                "",
                f"Across the {len(dtype_effs)} records with ARI < 0.8, the "
                f"mean pure-dtype agreement (f64+est vs f32+est) is "
                f"{sum(dtype_effs) / len(dtype_effs):.4f}; the remaining "
                "divergence is the est-limit config effect, which the "
                "reference exhibits under the same knob.",
            ]
        # guard recall/precision: the guard's job is predicting
        # DTYPE-driven divergence (it cannot see the est-limit config
        # effect, which is dtype-independent). A record counts as
        # dtype-divergent when its factored dtype-eff ARI < 0.95.
        guarded = [(k, r) for k, r in rows if "f32" in r
                   and "guard_fragile" in r["f32"]]
        if guarded:
            div = [(k, r) for k, r in guarded
                   if r.get("ari_dtype_effect") is not None
                   and r["ari_dtype_effect"] < 0.95]
            flagged = [(k, r) for k, r in guarded
                       if r["f32"]["guard_fragile"]]
            hits = [k for k, r in div if r["f32"]["guard_fragile"]]
            misses = [k.split("@")[0] for k, r in div
                      if not r["f32"]["guard_fragile"]]
            fp = [k.split("@")[0] for k, r in flagged
                  if not (r.get("ari_dtype_effect") is not None
                          and r["ari_dtype_effect"] < 0.95)]
            lines += [
                "",
                f"**Guard recall/precision** ({len(guarded)} records with "
                f"guard telemetry): {len(div)} records are dtype-divergent "
                f"(dtype-eff ARI < 0.95); the guard flags "
                f"{len(hits)}/{len(div)} of them"
                + (f" — false negatives: {', '.join(misses)}"
                   if misses else " (0 false negatives)")
                + f". {len(flagged)} records flagged in total"
                + (f"; flags on non-dtype-divergent records (conservative "
                   f"false positives, incl. est-effect-only divergence): "
                   f"{', '.join(fp)}." if fp else "."),
            ]
            # tolerance sweep over the recorded margins: is there ANY
            # threshold that separates dtype-divergent records from
            # stable ones? (margins are stored per record, so this is
            # recomputable offline without re-running the sweep)
            def _margin(r):
                m = r["f32"].get("guard_min_rel_margin")
                return float("inf") if m is None else m
            # labels: factored records use dtype-eff; unfactored records
            # with overall ARI >= 0.95 are end-to-end stable (dtype
            # divergence bounded by the overall divergence)
            labeled = [(k, _margin(r), r["ari_dtype_effect"] < 0.95)
                       for k, r in guarded
                       if r.get("ari_dtype_effect") is not None]
            labeled += [(k, _margin(r), False) for k, r in guarded
                        if r.get("ari_dtype_effect") is None
                        and r.get("ari", 0.0) >= 0.95]
            if labeled:
                sweep = []
                for tol in (1e-6, 1e-5, 1e-4, 1e-3, 1e-2):
                    tp = sum(1 for _k, m, d in labeled if m < tol and d)
                    fpc = sum(1 for _k, m, d in labeled
                              if m < tol and not d)
                    pos = sum(1 for _k, _m, d in labeled if d)
                    sweep.append(f"tol={tol:.0e}: recall {tp}/{pos}, "
                                 f"false alarms {fpc}")
                stable_min = min((m for _k, m, d in labeled if not d),
                                 default=float("inf"))
                lines += [
                    "",
                    "Threshold sweep over the recorded margins (factored "
                    "records + unfactored records with overall ARI >= "
                    "0.95 as the stable class): " + "; ".join(sweep)
                    + ".",
                    "",
                    "Interpretation: the min-margin signal detects "
                    "MARGIN-CRITICAL runs (decisions within f32 rounding "
                    "of flipping) — a distinct failure class from "
                    "end-state structural divergence, which typically "
                    "enters through accumulated refit rounding that "
                    "shifts scores by far more than the recorded margin "
                    "(e.g. rec 108 diverges with min margin 1.7e-3). No "
                    "threshold separates the two classes"
                    + (f" (the most stable records reach margins as low "
                       f"as {stable_min:.1e})" if stable_min < 1e-3
                       else "")
                    + ", so a guard flag is a definite warning, and the "
                    "ABSENCE of a flag is not a fidelity certificate: "
                    "per-record fidelity is certified by this table, and "
                    "exact results come from the f64 mode (HDPGPC_MP64=1 "
                    "for TPU speed). bench.py's quality gate keys on the "
                    "rec-100 flag plus classification error, both of "
                    "which this table pins.",
                ]
        missing = 42 - n
        if missing > 0:
            lines += ["", f"({missing} records pending — the artifact is "
                          "regenerated as runs complete.)"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({n} records)")


def arm_paths(arm, base_out, est=None):
    """Arm artifact paths. The f64 exact arm is config-independent and
    shared between est configs; an f32 arm is per-est-limit (the benched
    est300 keeps the legacy unsuffixed name so round-3/4 artifacts stay
    valid)."""
    stem = os.path.join(os.path.dirname(base_out), f"arm_{arm}")
    if arm in ("f32", "f64est") and est not in (None, 300):
        stem += f"_est{est}"
    return stem + ".json", stem + "_assignments.npz"


def run_arm(arm, args, mode, est):
    """Run one dtype arm over all records, resumable, own artifacts."""
    import numpy as np
    from hdpgpc_tpu.data.loader import list_records

    out, asg_path = arm_paths(arm, args.out, est)
    results = _load_json(out)
    asg = _load_npz(asg_path)
    # seed from the legacy combined artifact so round-3 runs are reused
    combined = _load_json(args.out)
    comb_asg = _load_npz(os.path.splitext(args.out)[0] + "_assignments.npz")

    recs = args.records.split(",") if args.records else list_records()
    for rec in recs:
        key = f"{rec}@{args.beats or 'full'}"
        akey = f"{key}:{arm}"
        if arm == "f64":
            done = key in results and akey in asg
            cached = key in combined and akey in comb_asg
        elif arm == "f64est":
            # divergence-factoring arm (f64 + the benched est limit);
            # round-4 merge stored a few of these inline in the
            # combined artifact — import those rather than re-run
            done = key in results and akey in asg
            cached = ("f64_est" in combined.get(key, {})
                      and akey in comb_asg)
        else:
            done = (key in results and akey in asg
                    and results[key].get("f32_mode") == mode)
            cached = (key in combined and akey in comb_asg
                      and combined[key].get("f32_mode") == mode)
        if getattr(args, "force", False):
            # force means re-RUN: skip both the done short-circuit and
            # the legacy-combined import (a cached entry predates the
            # guard telemetry / current solver backend)
            done = False
            cached = False
        if done:
            print(f"{key}: done", flush=True)
            continue
        if cached:
            results[key] = {k: v for k, v in combined[key].items()
                            if k in (arm, "f64_est", "beats", "f32_mode")}
            asg[akey] = comb_asg[akey]
            _atomic_json(out, results)
            _atomic_npz(asg_path, asg)
            print(f"{key}: imported from combined artifact", flush=True)
            continue
        try:
            if arm == "f64":
                r, a = run_one(rec, args.beats, "float64")
                entry = {"beats": args.beats or r["tot"], "f64": r}
            elif arm == "f64est":
                r, a = run_one(rec, args.beats, "float64", est_limit=est)
                entry = {"beats": args.beats or r["tot"], "f64_est": r}
            else:
                r, a = run_one(rec, args.beats, "float32", est_limit=est)
                entry = {"beats": args.beats or r["tot"], "f32": r,
                         "f32_mode": mode}
        except FileNotFoundError:
            continue
        results[key] = entry
        asg[akey] = np.asarray(a, np.int16)
        _atomic_json(out, results)
        _atomic_npz(asg_path, asg)
        print(f"[{arm}] rec {rec}: M {r['M']} err {r['err']}/{r['tot']} "
              f"({r['sec']}s, {r['platform']})", flush=True)


def merge(args, mode, est, factor=True):
    """Fold arm artifacts (+ legacy combined) into the canonical
    combined artifact, compute ARIs, run missing divergence-factoring
    f64+est arms, regenerate the markdown tables."""
    import numpy as np
    from hdpgpc_tpu.utils.eval import adjusted_rand_index

    combined = _load_json(args.out)
    comb_asg_path = os.path.splitext(args.out)[0] + "_assignments.npz"
    comb_asg = _load_npz(comb_asg_path)

    for arm in ("f64", "f32", "f64est"):
        out, asg_path = arm_paths(arm, args.out, est)
        res = _load_json(out)
        asg = _load_npz(asg_path)
        field = "f64_est" if arm == "f64est" else arm
        for key, entry in res.items():
            akey = f"{key}:{arm}"
            if field not in entry or akey not in asg:
                continue
            cur = combined.setdefault(key, {})
            if arm == "f32" and cur.get("f32_mode") not in (None, mode):
                # stale f32 data from an older mode: drop its ARI fields
                for k in ("f32", "ari", "ari_est_effect",
                          "ari_dtype_effect", "f64_est"):
                    cur.pop(k, None)
            cur.setdefault("beats", entry["beats"])
            cur[field] = entry[field]
            if arm == "f32":
                cur["f32_mode"] = entry["f32_mode"]
            comb_asg[akey] = asg[akey]

    for key, r in sorted(combined.items()):
        a64k, a32k = f"{key}:f64", f"{key}:f32"
        if not ("f64" in r and "f32" in r
                and a64k in comb_asg and a32k in comb_asg):
            continue
        if r.get("f32_mode") != mode:
            continue
        a64 = comb_asg[a64k]
        a32 = comb_asg[a32k]
        r["ari"] = round(float(adjusted_rand_index(a64, a32)), 6)
        # factor the divergence: est-limit config effect (f64 exact
        # vs f64+est) vs dtype effect (f64+est vs f32+est). The
        # reference itself behaves differently under an estimation
        # limit (GPI_HDP.py:90), so only the dtype axis is a
        # speed-mode fidelity question.
        a64ek = f"{key}:f64est"
        if r["ari"] < 0.8 and est and factor and a64ek not in comb_asg:
            rec = key.split("@")[0]
            print(f"{key}: ARI {r['ari']:.3f} < 0.8 — running f64+est{est} "
                  "factoring arm", flush=True)
            r64e, a64e = run_one(rec, args.beats, "float64", est_limit=est)
            r["f64_est"] = r64e
            comb_asg[a64ek] = np.asarray(a64e, np.int16)
            _atomic_json(args.out, combined)
            _atomic_npz(comb_asg_path, comb_asg)
        if a64ek in comb_asg:
            # (re)compute both factoring ARIs from assignments — never
            # trust fields computed against an older f32 arm
            a64e = comb_asg[a64ek]
            r["ari_est_effect"] = round(
                float(adjusted_rand_index(a64, a64e)), 6)
            r["ari_dtype_effect"] = round(
                float(adjusted_rand_index(a64e, a32)), 6)
    _atomic_json(args.out, combined)
    _atomic_npz(comb_asg_path, comb_asg)
    write_md(combined, args.md, est=est or 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", default=None)
    ap.add_argument("--beats", type=int, default=None,
                    help="cap beats per record (default: full record)")
    ap.add_argument("--est-limit", type=int, default=300,
                    help="estimation_limit for the f32 arm — the BENCHED "
                         "speed mode is f32+est300 (bench.py), so that is "
                         "the config the validation certifies; 0 disables. "
                         "The f64 arm always runs exact (no limit).")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--arm", choices=["f64", "f32", "f64est"], default=None,
                    help="run only this arm (own artifact; safe to run "
                         "arms as concurrent processes). f64est = the "
                         "divergence-factoring arm (f64 + the benched "
                         "est limit), consumed by --merge")
    ap.add_argument("--merge", action="store_true",
                    help="fold arm artifacts into the combined artifact, "
                         "compute ARIs + factoring arms, write markdown")
    ap.add_argument("--no-factor", action="store_true",
                    help="with --merge: skip the f64+est factoring runs")
    ap.add_argument("--force", action="store_true",
                    help="with --arm: re-run records already in the arm "
                         "artifact (e.g. to collect guard telemetry)")
    ap.add_argument("--out", default="docs/f32_validation.json")
    ap.add_argument("--md", default="docs/F32_VALIDATION.md")
    ap.add_argument("--write-md", action="store_true",
                    help="only regenerate the markdown table from --out")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    est = args.est_limit or None
    # acc64 = host ELBO accumulation in f64 (weight_mean/compute_q_elbo);
    # bumping the tag invalidates f32 arms computed before that fix
    mode = f"f32+est{est}+acc64" if est else "f32+acc64"

    if args.write_md:
        write_md(_load_json(args.out), args.md)
        return
    if args.merge:
        merge(args, mode, est, factor=not args.no_factor)
        return
    if args.arm:
        run_arm(args.arm, args, mode, est)
        return

    # legacy single-process mode: both arms inline, then merge
    run_arm("f64", args, mode, est)
    run_arm("f32", args, mode, est)
    merge(args, mode, est)


if __name__ == "__main__":
    main()
