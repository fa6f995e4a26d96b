#!/usr/bin/env bash
# Standing end-of-round bench gate (VERDICT r9 #6): regenerate the
# structure-preserving scaled corpora and run the full Bench suite at
# sf0.1, sf0.3 and sf1, archiving BENCH_FULL.json (sf0.1, written by
# Bench itself), BENCH_SF03.json and BENCH_SF1.json at the repo root.
# Usage: tools/bench_scales.sh [--skip-sf1]
set -euo pipefail
cd "$(dirname "$0")/.."
SKIP_SF1="${1:-}"
python3 tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sfscale/sf0.3 3
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01.log 2>&1 || echo "sf0.1 bench rc=$? (see /tmp/bench_sf01.log)"
grep -E '^\[info\] \{"metric"' /tmp/bench_sf01.log | tail -1 | sed 's/^\[info\] //'
# Bench rewrites BENCH_FULL.json on every full run regardless of SF —
# preserve the sf0.1 artifact across the scaled runs below
cp BENCH_FULL.json /tmp/bench_full_sf01.json
SPARK_GRAFT_SF_DIR=/tmp/sfscale/sf0.3 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf03.log 2>&1 || echo "sf0.3 bench rc=$? (see /tmp/bench_sf03.log)"
grep -E '^\[info\] \{"metric"' /tmp/bench_sf03.log | head -1 | sed 's/^\[info\] //' > BENCH_SF03.json
grep -E '^\[info\] \{"metric"' /tmp/bench_sf03.log | tail -1 | sed 's/^\[info\] //'
if [ "$SKIP_SF1" != "--skip-sf1" ]; then
  python3 tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sfscale/sf1 10
  SPARK_GRAFT_SF_DIR=/tmp/sfscale/sf1 sbt -batch "runMain graft.Bench" \
    > /tmp/bench_sf1.log 2>&1 || echo "sf1 bench rc=$? (see /tmp/bench_sf1.log)"
  grep -E '^\[info\] \{"metric"' /tmp/bench_sf1.log | head -1 | sed 's/^\[info\] //' > BENCH_SF1.json
  grep -E '^\[info\] \{"metric"' /tmp/bench_sf1.log | tail -1 | sed 's/^\[info\] //'
fi
cp /tmp/bench_full_sf01.json BENCH_FULL.json
