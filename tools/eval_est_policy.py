"""Evaluate an adaptive estimation-limit policy (VERDICT r4 ask #8).

est300 (the benched speed config) materially alters clustering on some
records (docs/F32_VALIDATION.md `est eff` column) while being exact on
others — a fixed global limit is the wrong shape. The candidate policy
here is STABILITY DOUBLING, the cheapest self-certifying rule:

    run with est=L (default 300); re-run with est=2L;
    if ARI(L, 2L) >= 0.99 accept the est=L result, else L <- 2L and
    repeat (terminating at est=None, the exact mode).

Rationale: the est limit is a truncation knob (GPI_HDP.py:90) — when
halving the truncation error changes nothing structurally, the
truncation has converged. The policy's cost is 2x the base run when
stable (the common case), degrading gracefully to the exact run when
the record genuinely needs it.

This tool does not run sweeps; it EVALUATES the policy from the
resumable arm artifacts produced by tools/validate_f32.py:

    docs/arm_f32.json[_assignments.npz]          est300 (benched)
    docs/arm_f32_est600.json[...]                est600
    docs/arm_f32_est1200.json[...]               est1200 (optional)
    docs/arm_f32_est0.json[...]                  f32 exact (optional)
    docs/arm_f64.json[...]                       f64 exact (oracle)

Produce the extra arms with e.g.
    python tools/validate_f32.py --arm f32 --est-limit 600

Output: per-record chosen limit, policy ARI vs the f64 exact oracle,
summary counts, cost multiple — written to docs/EST_POLICY_EVAL.md
(the measured-conclusion narrative lives in docs/EST_POLICY.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [300, 600, 1200, 0]   # 0 = no limit (exact f32)


def _arm_files(est):
    stem = "docs/arm_f32" if est == 300 else f"docs/arm_f32_est{est}"
    return stem + ".json", stem + "_assignments.npz"


def load_arm(est):
    import numpy as np
    j, a = _arm_files(est)
    if not (os.path.exists(j) and os.path.exists(a)):
        return {}
    res = json.load(open(j))
    asg = dict(np.load(a))
    out = {}
    for key, entry in res.items():
        akey = f"{key}:f32"
        if "f32" in entry and akey in asg:
            out[key] = (entry["f32"], asg[akey])
    return out


def main():
    import numpy as np
    from hdpgpc_tpu.utils.eval import adjusted_rand_index

    ap = argparse.ArgumentParser()
    ap.add_argument("--stable-ari", type=float, default=0.99)
    ap.add_argument("--out", default="docs/EST_POLICY_EVAL.md")
    args = ap.parse_args()

    arms = {est: load_arm(est) for est in ARMS}
    f64 = {}
    if os.path.exists("docs/arm_f64.json"):
        res = json.load(open("docs/arm_f64.json"))
        asg = dict(np.load("docs/arm_f64_assignments.npz"))
        for key, entry in res.items():
            akey = f"{key}:f64"
            if "f64" in entry and akey in asg:
                f64[key] = (entry["f64"], asg[akey])

    keys = sorted(set(arms[300]) & set(f64))
    rows = []
    for key in keys:
        rec = key.split("@")[0]
        chain = [(est, arms[est][key]) for est in ARMS if key in arms[est]]
        chosen_est, chosen, cost = None, None, 0.0
        base_sec = chain[0][1][0]["sec"]
        for i, (est, (r, a)) in enumerate(chain):
            cost += r["sec"]
            if i + 1 < len(chain):
                nxt = chain[i + 1][1][1]
                ari_next = float(adjusted_rand_index(a, nxt))
                if ari_next >= args.stable_ari:
                    # stability: also pay for the certifying run
                    cost += chain[i + 1][1][0]["sec"]
                    chosen_est, chosen = est, (r, a)
                    break
            else:
                chosen_est, chosen = est, (r, a)
        r, a = chosen
        ari_exact = float(adjusted_rand_index(a, f64[key][1]))
        base_ari = float(adjusted_rand_index(arms[300][key][1], f64[key][1]))
        rows.append({
            "rec": rec, "chosen_est": chosen_est,
            "chain_len": len(chain),
            "policy_ari": round(ari_exact, 4),
            "est300_ari": round(base_ari, 4),
            "M_policy": r["M"], "M_f64": f64[key][0]["M"],
            "err_policy": r["err"], "err_f64": f64[key][0]["err"],
            "tot": r["tot"],
            "cost_x": round(cost / max(base_sec, 1e-9), 2),
        })

    lines = [
        "# Adaptive estimation-limit policy — stability doubling",
        "",
        "Policy: run est=L, certify with est=2L; accept when",
        f"ARI(L,2L) >= {args.stable_ari}, else escalate (300 -> 600 ->",
        "1200 -> exact). Evaluated from the committed f32 arm artifacts",
        "against the f64 exact oracle (tools/eval_est_policy.py).",
        "",
        "| rec | chosen est | policy ARI vs exact | est300 ARI | M pol/f64 "
        "| err pol/f64 | cost x |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['rec']} | {r['chosen_est'] or 'exact'} "
            f"| {r['policy_ari']:.3f} | {r['est300_ari']:.3f} "
            f"| {r['M_policy']}/{r['M_f64']} "
            f"| {r['err_policy']}/{r['err_f64']} (of {r['tot']}) "
            f"| {r['cost_x']} |")
    if rows:
        ok = sum(r["policy_ari"] >= 0.9 for r in rows)
        ok300 = sum(r["est300_ari"] >= 0.9 for r in rows)
        mean_cost = sum(r["cost_x"] for r in rows) / len(rows)
        lines += [
            "",
            f"**{len(rows)} records: policy reaches ARI >= 0.9 on "
            f"{ok}/{len(rows)} (fixed est300: {ok300}/{len(rows)}); "
            f"mean cost {mean_cost:.2f}x the single est300 run.**",
        ]
    incomplete = [k.split("@")[0] for k in keys
                  if len([e for e in ARMS if k in arms[e]]) < 2]
    if incomplete:
        lines += ["", f"(Records with only the est300 arm — policy "
                      f"cannot escalate yet: {', '.join(incomplete)})"]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(rows)} records)")


if __name__ == "__main__":
    main()
