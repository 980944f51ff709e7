#!/usr/bin/env python3
"""Merge several graft.Bench JSON outputs into one BENCH-format artifact
and print a per-query ratio table between two scale factors.

Usage:
  bench_merge.py merge OUT.json IN1.log [IN2.log ...]
      # later files override earlier per-query entries; totals recomputed
  bench_merge.py ratio SMALL.json BIG.json [--cpu]
      # per-query wall (or cpu) ratios BIG/SMALL, sorted descending
"""
import json
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


if __name__ == "__main__":
    if len(sys.argv) < 4 or sys.argv[1] not in ("merge", "ratio"):
        raise SystemExit(__doc__)
    if sys.argv[1] == "merge":
        merge(sys.argv[2], sys.argv[3:])
    else:
        ratio(sys.argv[2], sys.argv[3],
              use_cpu="--cpu" in sys.argv[4:])
