#!/usr/bin/env python3
"""Merge several graft.Bench JSON outputs into one BENCH-format artifact
and print a per-query ratio table between two scale factors.

Usage:
  bench_merge.py merge OUT.json IN1.log [IN2.log ...]
      # later files override earlier per-query entries; totals recomputed
  bench_merge.py ratio SMALL.json BIG.json [--cpu]
      # per-query wall (or cpu) ratios BIG/SMALL, sorted descending
  bench_merge.py decades OUT.json SF1.json SF10.json [PREV_SF1 PREV_SF10]
      # write the HOST-NORMALIZED decade artifact: per-key sf10/sf1 wall
      # and cpu ratios (within-run, so host drift cancels), their
      # shared-key totals and median, and — with a previous round's pair —
      # the cross-round RATIO-OF-RATIOS per key (this decade ratio /
      # previous decade ratio; ~1.0 = same scaling shape, host-independent).
      # Raw cross-round wall comparisons are NOT meaningful across hosts;
      # this table is what rounds compare (SURVEY §6).
"""
import json
import statistics
import sys


def load(path):
    """Last {"metric":"total"...} line of a bench log/artifact. Parses any
    JSON line and checks the field value, so both Bench's compact output
    and a previously-merged (possibly space-separated) artifact load."""
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if d.get("metric") == "total":
                    out = d
    if out is None:
        raise SystemExit(f"{path}: no bench total line")
    return out


def merge(out_path, ins):
    queries, cpu, sf = {}, {}, None
    skipped = []
    for p in ins:
        b = load(p)
        queries.update(b.get("queries", {}))
        cpu.update(b.get("cpu", {}))
        sf = b.get("sf", sf)
        for q in b.get("skipped", []):
            if q not in skipped:
                skipped.append(q)
    # a query measured by ANY input is not skipped in the merged artifact
    # (a gated full run merged with a targeted re-run of the gated query
    # must not misreport the union as still gated)
    skipped = [q for q in skipped if q not in queries]
    art = {
        "metric": "total",
        "value": round(sum(queries.values()), 6),
        "unit": "sec",
        "cpu_total": round(sum(cpu.values()), 2),
        "skipped": skipped,
        "queries": dict(sorted(queries.items())),
        "cpu": dict(sorted(cpu.items())),
        "sf": sf,
        "merged_from": ins,
    }
    with open(out_path, "w") as f:
        # compact separators: the artifact must stay a loadable bench line
        json.dump(art, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out_path}: {len(queries)} queries, "
          f"total {art['value']:.1f}s wall / {art['cpu_total']:.0f} cpu-s")


def ratio(small_path, big_path, use_cpu=False):
    key = "cpu" if use_cpu else "queries"
    a, b = load(small_path)[key], load(big_path)[key]
    rows = []
    for q in sorted(set(a) & set(b)):
        if a[q] > 0:
            rows.append((b[q] / a[q], q, a[q], b[q]))
    rows.sort(reverse=True)
    unit = "cpu" if use_cpu else "wall"
    print(f"{'ratio':>7}  {unit+'-small':>10}  {unit+'-big':>10}  query")
    for r, q, s, g in rows:
        print(f"{r:7.1f}  {s:10.2f}  {g:10.2f}  {q}")
    tot_a = sum(a[q] for _, q, _, _ in rows)
    tot_b = sum(b[q] for _, q, _, _ in rows)
    print(f"shared-key totals: {tot_a:.1f} -> {tot_b:.1f} "
          f"({tot_b / tot_a:.2f}x) over {len(rows)} queries")


def _ratios(small, big, key):
    # .get({}): a bench JSON missing the section (or a query present in
    # "queries" but absent from "cpu") degrades to fewer shared keys
    # instead of a KeyError killing the whole artifact
    a, b = small.get(key, {}), big.get(key, {})
    return {q: b[q] / a[q] for q in sorted(set(a) & set(b)) if a[q] > 0}


def decades(out_path, sf1_path, sf10_path, prev=None):
    s1, s10 = load(sf1_path), load(sf10_path)
    wall = _ratios(s1, s10, "queries")
    cpu = _ratios(s1, s10, "cpu")
    shared = sorted(wall)
    cpu_shared = sorted(set(shared) & set(cpu))
    tot1 = sum(s1["queries"][q] for q in shared)
    tot10 = sum(s10["queries"][q] for q in shared)
    ctot1 = sum(s1["cpu"][q] for q in cpu_shared)
    ctot10 = sum(s10["cpu"][q] for q in cpu_shared)
    art = {
        "metric": "decades",
        "n_queries": len(shared),
        # cpu coverage can be NARROWER than wall coverage (a bench JSON
        # may carry a query under "queries" but not "cpu") — record it so
        # a wall-vs-cpu headline comparison over different key sets is
        # visible, not silent (review finding)
        "n_cpu_queries": len(cpu_shared),
        "wall_ratio": round(tot10 / tot1, 3) if tot1 > 0 else None,
        "cpu_ratio": round(ctot10 / ctot1, 3) if ctot1 > 0 else None,
        "median_wall_ratio": round(statistics.median(wall.values()), 3) if wall else None,
        "worst5": {q: round(wall[q], 2)
                   for q in sorted(wall, key=wall.get, reverse=True)[:5]},
        "wall_ratios": {q: round(r, 3) for q, r in sorted(wall.items())},
        "cpu_ratios": {q: round(r, 3) for q, r in sorted(cpu.items())},
        "sf1": sf1_path,
        "sf10": sf10_path,
    }
    if prev:
        p1, p10 = load(prev[0]), load(prev[1])
        pwall = _ratios(p1, p10, "queries")
        ror = {q: round(wall[q] / pwall[q], 3)
               for q in sorted(set(wall) & set(pwall)) if pwall[q] > 0}
        art["prev_sf1"], art["prev_sf10"] = prev
        art["ratio_of_ratios"] = ror
        if ror:
            art["ror_median"] = round(statistics.median(ror.values()), 3)
            art["ror_worst5"] = {q: ror[q]
                                 for q in sorted(ror, key=ror.get, reverse=True)[:5]}
    with open(out_path, "w") as f:
        json.dump(art, f, separators=(",", ":"))
        f.write("\n")
    msg = (f"{out_path}: {len(shared)} shared keys, decade "
           f"{art['wall_ratio']}x wall / {art['cpu_ratio']}x cpu, "
           f"median {art['median_wall_ratio']}x")
    if prev and art.get("ror_median") is not None:
        msg += f"; ratio-of-ratios vs prev median {art['ror_median']}"
    print(msg)


if __name__ == "__main__":
    if len(sys.argv) < 4 or sys.argv[1] not in ("merge", "ratio", "decades"):
        raise SystemExit(__doc__)
    if sys.argv[1] == "merge":
        merge(sys.argv[2], sys.argv[3:])
    elif sys.argv[1] == "decades":
        if len(sys.argv) not in (5, 7):
            raise SystemExit(__doc__)
        decades(sys.argv[2], sys.argv[3], sys.argv[4],
                prev=tuple(sys.argv[5:7]) if len(sys.argv) == 7 else None)
    else:
        ratio(sys.argv[2], sys.argv[3],
              use_cpu="--cpu" in sys.argv[4:])
