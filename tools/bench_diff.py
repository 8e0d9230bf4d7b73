#!/usr/bin/env python3
"""Probe-normalized bench diff over bench_history.jsonl (round-15/16).

Usage:
  python3 tools/bench_diff.py [historyPath] [--last N]

Compares the newest clean line against the previous clean line(s),
preferring probe-normalized totals (`value_norm`, or derived here from
`probe_secs` when a line predates the field) so a 1.2x-slow box does
not read as a 1.2x plan regression — the r14 confusion (a certified
96.04s line vs the same code's 87.96s on a quieter box) adjudicated by
hand back then, mechanical now.

Round-16:
  - the probe elasticity is FITTED from all same-`code_fp` clean pairs
    in the history (each pair of runs of identical code at different
    probe speeds yields one estimate log(v1/v2)/log(p1/p2)); the
    0.21 single-pair prior remains the fallback, and
    BENCH_ELASTICITY=<x> in the environment pins it outright;
  - a file whose NEWEST line is a refused window (`window_clean:false`,
    e.g. a driver BENCH_rN.json) is adjudicated from the line's embedded
    `last_certified` summary instead of being silently skipped.

Per-query drift is judged against each line's own `clean_medians`
snapshot when present, else cross-line, with min-of-available on the
older side (a single slow pass must not read as a regression).
"""
import json
import math
import os
import statistics
import sys


def load_lines(path):
    out = []
    with open(path) as fh:
        for raw in fh:
            raw = raw.strip()
            if not raw:
                continue
            try:
                out.append(json.loads(raw))
            except json.JSONDecodeError:
                continue
    return out


def is_clean(o):
    return (o.get("window_clean", True)
            and not o.get("hot_run", False)
            and len(o.get("queries", {})) >= 200)


def probe_median(o):
    ps = [p for p in o.get("probe_secs", []) if p > 0]
    return statistics.median(ps) if ps else None


ELASTICITY_PRIOR = 0.21  # the measured r14 same-code pair; see Bench.scala


def fit_elasticity(lines):
    """Median of per-pair estimates across all same-code_fp clean pairs
    with a meaningful probe-speed spread. Returns (elasticity, n_pairs,
    source)."""
    pinned = os.environ.get("BENCH_ELASTICITY")
    if pinned:
        return float(pinned), 0, "env-pinned"
    by_fp = {}
    for o in lines:
        fp = o.get("code_fp")
        pm = probe_median(o)
        v = o.get("value")
        if fp and fp != "unknown" and pm and v:
            by_fp.setdefault(fp, []).append((pm, v))
    ests = []
    for runs in by_fp.values():
        for i in range(len(runs)):
            for j in range(i + 1, len(runs)):
                (p1, v1), (p2, v2) = runs[i], runs[j]
                # require a real speed spread: tiny probe deltas make the
                # ratio of logs explode on measurement noise
                if min(p1, p2) <= 0 or abs(math.log(p1 / p2)) < 0.1:
                    continue
                ests.append(math.log(v1 / v2) / math.log(p1 / p2))
    if ests:
        return statistics.median(ests), len(ests), "fitted"
    return ELASTICITY_PRIOR, 0, "prior (no same-code_fp pairs)"


def norm_total(o, ref, elasticity):
    """Quiet-box-equivalent total: prefer the recorded value_norm
    (computed against the run's own history reference); else derive
    from probe_secs against the shared reference with the DAMPENED
    model (the probe is pure-CPU; the registry total's measured
    elasticity to probe speed is ~0.21, not 1.0)."""
    if o.get("value_norm") is not None:
        return o["value_norm"]
    pm = probe_median(o)
    if ref and pm:
        return o.get("value", 0.0) / ((pm / ref) ** elasticity)
    return o.get("value", 0.0)


def main():
    path = "bench_history.jsonl"
    last = 2
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--last":
            last = int(args.pop(0))
        else:
            path = a
    all_lines = load_lines(path)
    lines = [o for o in all_lines if is_clean(o)]
    elasticity, n_pairs, source = fit_elasticity(lines)
    print(f"elasticity {elasticity:.3f} ({source}"
          + (f", {n_pairs} same-code pairs" if source == "fitted" else "")
          + ")")

    # a refused newest line (driver BENCH_rN.json): prefer its embedded
    # certified summary — that IS the trustworthy number for the round
    if all_lines and not all_lines[-1].get("window_clean", True):
        cert = all_lines[-1].get("last_certified")
        if cert:
            print("newest line is a REFUSED window; adjudicating from its "
                  f"embedded last_certified: ts={cert.get('ts','?')} "
                  f"value={cert.get('value')}s "
                  f"value_norm={cert.get('value_norm')}s "
                  f"n={cert.get('n')}")
        else:
            print("newest line is a REFUSED window with no last_certified "
                  "fallback; ignoring it")

    if len(lines) < 2:
        print(f"need >=2 clean full-registry lines in {path}, have {len(lines)}")
        return 1
    window = lines[-last:] if last >= 2 else lines[-2:]
    cur, prev = window[-1], window[-2]
    pms = [probe_median(o) for o in lines if probe_median(o)]
    ref = statistics.median(pms) if pms else None

    for tag, o in (("prev", prev), ("cur ", cur)):
        pm = probe_median(o)
        pm_s = f"{pm:.4f}s" if pm is not None else "n/a"
        print(f"{tag} ts={o.get('ts','?')} fp={o.get('code_fp','?')} "
              f"raw={o.get('value'):.2f}s "
              f"norm={norm_total(o, ref, elasticity):.2f}s "
              f"probe_median={pm_s} probe_ratio={o.get('probe_ratio')}")
    nc = norm_total(cur, ref, elasticity)
    np_ = norm_total(prev, ref, elasticity)
    print(f"normalized total ratio cur/prev = {nc / np_:.3f} "
          f"(raw would read {cur.get('value') / prev.get('value'):.3f})")

    # per-query: current min-of-2 vs its own clean-median snapshot when
    # recorded, else the previous line's time; report >1.5x offenders
    base = cur.get("clean_medians") or prev.get("queries", {})
    qcur = cur.get("queries", {})
    bad = []
    for name, t in sorted(qcur.items()):
        b = base.get(name)
        if t is None or b is None or t < 0 or b <= 0:
            continue
        r = t / b
        if r > 1.5 and t - b > 0.05:  # ratio + absolute floor: a 20ms
            bad.append((r, name, t, b))  # query's jitter is not drift
    bad.sort(reverse=True)
    if bad:
        print(f"{len(bad)} queries >1.5x their clean baseline:")
        for r, name, t, b in bad[:20]:
            print(f"  {name}: {t:.3f}s vs {b:.3f}s ({r:.2f}x)")
    else:
        print("no per-query regression >1.5x vs clean baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
