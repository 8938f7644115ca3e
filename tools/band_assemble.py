#!/usr/bin/env python3
"""Assemble BAND_r{N}.json / BAND_r{N}-detail.json from five bench passes,
with MECHANIZED drift adjudication (r19 verdict directive 6).

Three consecutive rounds of registry-wide upward band drift were
hand-adjudicated against host co-tenancy; since r19 the per-query pass
loads ride in bench-detail.json, so the attribution is computable. This
script computes it and flags ONLY load-UNcorrelated regressions for
human judgment — everything else auto-adjudicates in-record.

Usage:
  tools/band_assemble.py --passdir /tmp/band20 --round 20 --tree <sha> \
      --prior BAND_r19.json --prior-detail BAND_r19-detail.json \
      [--plan-changes q186_frontier_schedule,...] [--note "..."] \
      [--out BAND_r20.json]

Expects passdir/bench-<i>.json and passdir/bench-detail-<i>.json for
i = 1..N (copies of target/bench.json / target/bench-detail.json taken
after each pass).

Adjudication per flagged query (best-of-five > 1.3x prior band's
worst-of-five), in precedence order:
  1. plan_change     — named in --plan-changes (a deliberate plan change
                       this round; the scale rows carry its story);
  2. quiet_pass_clears — some pass ran at mean per-query load < 1.0 and
                       its time is within 1.3x of the prior worst (a
                       quiet observation refutes the regression);
  3. load_correlated — Pearson corr(time, load) across this round's
                       passes >= 0.5 (the slow passes are the loaded
                       passes: co-tenancy, not code);
  4. UNEXPLAINED     — none of the above; needs human judgment.

The record also carries the REGISTRY-level decomposition: the
correlation across common queries between (best_rN / best_r{N-1}) and
the load during the best pass — registry-wide drift that tracks load is
co-tenancy by construction.
"""
import argparse, glob, json, math, os, re, sys

GEDCOM_BYTES = {"gedcom_150m": 150 << 20, "gedcom_1g": 1 << 30}


def pearson(xs, ys):
    n = len(xs)
    if n < 2:
        return None
    mx, my = sum(xs) / n, sum(ys) / n
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    if sx == 0 or sy == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (sx * sy)


def mean(xs):
    return sum(xs) / len(xs) if xs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passdir", required=True)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--tree", required=True)
    ap.add_argument("--prior", required=True)
    ap.add_argument("--prior-detail", required=True)
    ap.add_argument("--plan-changes", default="")
    ap.add_argument("--note", default="")
    ap.add_argument("--quiet-probes", default=None,
                    help="optional JSON file of out-of-band quiet probes to embed")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    rn = a.round
    plan_changes = set(filter(None, a.plan_changes.split(",")))

    def load_seq(pat):
        files = sorted(glob.glob(os.path.join(a.passdir, pat)),
                       key=lambda p: int(re.search(r"(\d+)\.json$", p).group(1)))
        return [json.load(open(p)) for p in files]

    benches = load_seq("bench-[0-9]*.json")
    details = load_seq("bench-detail-[0-9]*.json")
    assert len(benches) == len(details) and benches, "pass files missing"
    npass = len(benches)

    prior = json.load(open(a.prior))
    prior_detail = json.load(open(a.prior_detail))
    prior_rn = prior["round"]
    prior_passes = prior_detail["passes"]

    qnames = [k for k in details[0] if not k.startswith("gedcom_")]
    # per-pass per-query (best_sec, mean_load)
    per_pass = {q: [(d[q]["best"], mean(d[q].get("loads") or []))
                    for d in details if q in d] for q in qnames}
    best = {q: min(v for v, _ in per_pass[q]) for q in qnames}
    best_load = {q: min(per_pass[q])[1] for q in qnames}

    prior_best, prior_worst = {}, {}
    for p in prior_passes:
        for q, rec in p.items():
            if q.startswith("gedcom_"):
                continue
            prior_best[q] = min(prior_best.get(q, 9e9), rec["best"])
            prior_worst[q] = max(prior_worst.get(q, 0.0), rec["best"])

    common = sorted(set(best) & set(prior_best))
    new_queries = sorted(set(best) - set(prior_best))

    # registry-level decomposition: does this round's drift track load?
    ratios = [best[q] / prior_best[q] for q in common]
    loads = [best_load[q] for q in common if best_load[q] is not None]
    reg_corr = pearson(
        [best[q] / prior_best[q] for q in common if best_load[q] is not None],
        loads)

    flags, unexplained = {}, []
    for q in common:
        if best[q] <= 1.3 * prior_worst[q]:
            continue
        times = [t for t, _ in per_pass[q]]
        ls = [l for _, l in per_pass[q] if l is not None]
        corr = pearson(times, ls) if len(ls) == len(times) else None
        quiet = [(t, l) for t, l in per_pass[q]
                 if l is not None and l < 1.0 and t <= 1.3 * prior_worst[q]]
        if q in plan_changes:
            verdict = "plan_change(recorded)"
        elif quiet:
            verdict = "quiet_pass_clears(auto)"
        elif corr is not None and corr >= 0.5:
            verdict = "load_correlated(auto)"
        else:
            verdict = "UNEXPLAINED(needs-judgment)"
            unexplained.append(q)
        flags[q] = {
            f"r{rn}_best": round(best[q], 2),
            f"r{prior_rn}_worst": round(prior_worst[q], 2),
            "ratio": round(best[q] / prior_worst[q], 2),
            "per_pass_sec_load": [[round(t, 2), l] for t, l in per_pass[q]],
            "time_load_corr": None if corr is None else round(corr, 2),
            "verdict": verdict,
        }

    # gedcom legs
    legs = {}
    for leg, size in GEDCOM_BYTES.items():
        if leg not in details[0]:
            continue
        mbs = [[round(size / 1e6 / s, 1) for s in d[leg]["passes"]]
               for d in details if leg in d]
        ld = [[round(x, 1) for x in d[leg].get("loads", [])]
              for d in details if leg in d]
        legs[leg] = {"mbs_passes_per_bench_pass": mbs,
                     "load_per_bench_pass": ld,
                     "best_mb_per_s": max(max(r) for r in mbs)}

    band = {
        "round": rn,
        "tree": a.tree,
        "sf": benches[0].get("sf"),
        "n_queries": len(qnames),
        "passes_total_sec": [round(b["value"], 4) if b.get("value") else None
                             for b in benches],
        "passes_failed": [b.get("failed", 0) for b in benches],
        "passes_loadavg": [b.get("loadavg") for b in benches],
        f"common_with_r{prior_rn}": {
            "n": len(common),
            f"sum_best_of_five_r{rn}": round(sum(best[q] for q in common), 1),
            f"sum_best_of_five_r{prior_rn}":
                round(sum(prior_best[q] for q in common), 1),
        },
        "new_queries_best": {q: round(best[q], 2) for q in new_queries},
        f"queries_over_1p3x_r{prior_rn}_worst": flags,
        "drift_adjudication": {
            "rule": "mechanized (r19 directive 6): plan_change > "
                    "quiet_pass_clears > load_correlated(corr>=0.5) > "
                    "UNEXPLAINED; only UNEXPLAINED needs human judgment",
            "registry_corr_best_ratio_vs_load":
                None if reg_corr is None else round(reg_corr, 2),
            "flagged": len(flags),
            "auto_adjudicated": len(flags) - len(unexplained),
            "unexplained": unexplained,
        },
        "gedcom_legs": legs,
        "note": a.note,
    }
    if a.quiet_probes:
        band["quiet_probes"] = json.load(open(a.quiet_probes))

    out = a.out or f"BAND_r{rn}.json"
    json.dump(band, open(out, "w"), indent=1)
    json.dump({"round": rn, "tree": a.tree, "passes": details},
              open(out.replace(".json", "-detail.json"), "w"))
    print(f"wrote {out} (+detail): {len(qnames)} queries, "
          f"{len(flags)} flagged, {len(unexplained)} unexplained")
    if unexplained:
        print("UNEXPLAINED:", ", ".join(unexplained))


if __name__ == "__main__":
    main()
