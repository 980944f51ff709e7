#!/usr/bin/env bash
# Changed-only bench: derive SPARK_GRAFT_ONLY from the git diff so an
# iterating builder times only the queries whose operator files changed,
# instead of the full registry (155 queries x RUNS is ~8 min per loop).
#
#   tools/bench_changed.sh [REF]      # diff vs REF (default HEAD:
#                                     #   uncommitted work-in-progress)
#   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_RUNS=... pass through as usual.
#
# Mapping: a changed src/main file owns the queries whose SparkEntry
# registration line references its top-level object (one registration per
# line by repo convention — TsConventionSpec pins the registry shape).
# Cross-cutting files (SparkEntry, Tables, GraftSession, Bench, Exact,
# everything under functions/ and plans/) force a FULL run: they can move
# any plan. This is a builder ITERATION dial only — round-close artifacts
# are always full-registry runs (SURVEY §6).
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:-HEAD}"

mapfile -t changed < <(git diff --name-only "$REF" -- src/main | grep '\.scala$' || true)
if [ "${#changed[@]}" -eq 0 ]; then
  echo "bench_changed: no src/main changes vs $REF — nothing to bench" >&2
  exit 0
fi

full=0
declare -a objs=()
for f in "${changed[@]}"; do
  case "$f" in
    */SparkEntry.scala|*/Tables.scala|*/GraftSession.scala|*/Bench.scala|*/Verify.scala|*/functions/*|*/plans/*)
      full=1 ;;
    *) objs+=("$(basename "$f" .scala)") ;;
  esac
done

if [ "$full" -eq 1 ]; then
  echo "bench_changed: cross-cutting file changed — running the FULL registry" >&2
  exec tools/run.sh graft.Bench
fi

queries=""
for o in "${objs[@]}"; do
  # registration lines look like either
  #   "q29d_nms" -> (RosbagDomainOps.nmsTable _),
  #   "q29c_det_ap" -> ((s: SparkSession, d: String) => RosbagDomainOps.detAveragePrecision(s, d)),
  # one per line (TsConventionSpec pins the registry shape)
  qs=$(grep -E '"q[^"]+"[[:space:]]*->.*\b'"$o"'\.' src/main/scala/graft/SparkEntry.scala \
       | grep -oE '"q[^"]+"' | tr -d '"' || true)
  queries="$queries $qs"
done
queries=$(echo "$queries" | tr ' ' '\n' | sort -u | grep . | paste -sd, -)

if [ -z "$queries" ]; then
  echo "bench_changed: changed files (${objs[*]}) register no driver queries" >&2
  echo "bench_changed: (jobs/sources/streaming/multimodal changes are spec-covered, not benched)" >&2
  exit 0
fi

echo "bench_changed: SPARK_GRAFT_ONLY=$queries" >&2
SPARK_GRAFT_ONLY="$queries" exec tools/run.sh graft.Bench
