#!/usr/bin/env python3
"""Probe-normalized bench diff over bench_history.jsonl (round-15).

Usage:
  python3 tools/bench_diff.py [historyPath] [--last N]

Compares the newest clean line against the previous clean line(s),
preferring probe-normalized totals (`value_norm`, or derived here from
`probe_secs` when a line predates the field) so a 1.2x-slow box does
not read as a 1.2x plan regression — the r14 confusion (a certified
96.04s line vs the same code's 87.96s on a quieter box) adjudicated by
hand back then, mechanical now.

Per-query drift is judged against each line's own `clean_medians`
snapshot when present, else cross-line, with min-of-available on the
older side (a single slow pass must not read as a regression).
"""
import json
import statistics
import sys


def load_clean(path):
    lines = []
    with open(path) as fh:
        for raw in fh:
            raw = raw.strip()
            if not raw:
                continue
            try:
                o = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if not o.get("window_clean", True):
                continue
            if o.get("hot_run", False):
                continue
            if len(o.get("queries", {})) < 200:
                continue  # few-query probes read high (underwarmed)
            lines.append(o)
    return lines


def probe_median(o):
    ps = [p for p in o.get("probe_secs", []) if p > 0]
    return statistics.median(ps) if ps else None


ELASTICITY = 0.21  # measured from the r14 same-code pair; see Bench.scala


def norm_total(o, ref):
    """Quiet-box-equivalent total: prefer the recorded value_norm
    (computed against the run's own history reference); else derive
    from probe_secs against the shared reference with the DAMPENED
    model (the probe is pure-CPU; the registry total's measured
    elasticity to probe speed is ~0.21, not 1.0)."""
    if "value_norm" in o:
        return o["value_norm"]
    pm = probe_median(o)
    if ref and pm:
        return o.get("value", 0.0) / ((pm / ref) ** ELASTICITY)
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
    lines = load_clean(path)
    if len(lines) < 2:
        print(f"need >=2 clean full-registry lines in {path}, have {len(lines)}")
        return 1
    window = lines[-last:] if last >= 2 else lines[-2:]
    cur, prev = window[-1], window[-2]
    pms = [probe_median(o) for o in lines if probe_median(o)]
    ref = statistics.median(pms) if pms else None

    for tag, o in (("prev", prev), ("cur ", cur)):
        pm = probe_median(o)
        print(f"{tag} ts={o.get('ts','?')} raw={o.get('value'):.2f}s "
              f"norm={norm_total(o, ref):.2f}s "
              f"probe_median={pm:.4f}s probe_ratio={o.get('probe_ratio')}")
    nc, np_ = norm_total(cur, ref), norm_total(prev, ref)
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
