#!/usr/bin/env bash
# Standing end-of-round bench gate (VERDICT r9 #6): regenerate the
# structure-preserving scaled corpora and run the full Bench suite at
# sf0.1, sf0.3 and sf1, archiving BENCH_FULL.json (sf0.1, written by
# Bench itself), BENCH_SF03.json and BENCH_SF1.json at the repo root.
#
# Contention guard (VERDICT r10 #6): each SF's ORACLE total is compared
# against the previous round's artifact; >25% drift means the host was
# contended during the sweep, so that SF re-runs ONCE, and the final
# artifact carries oracle_drift_vs_prev / oracle_drift_flag either way —
# a contended sweep can't silently become the round's headline.
# Usage: tools/bench_scales.sh [--skip-sf1]
set -euo pipefail
cd "$(dirname "$0")/.."
SKIP_SF1="${1:-}"

# Symmetric steal guard (round-13 "what's wrong" #1): the engine leg
# min-of-redos clamps its steal inflation, so STAMPED artifacts give the
# oracle leg the same treatment — repeat-min 2 by default. Overridable
# for quick iteration runs where the doubled DuckDB leg isn't worth it.
export GRAFT_ORACLE_REPEAT="${GRAFT_ORACLE_REPEAT:-2}"

# previous-round artifacts, captured BEFORE Bench overwrites them
mkdir -p /tmp/sfscale
cp BENCH_FULL.json /tmp/prev_sf01.json 2>/dev/null || true
cp BENCH_SF03.json /tmp/prev_sf03.json 2>/dev/null || true
cp BENCH_SF1.json /tmp/prev_sf1.json 2>/dev/null || true

# run_sf <sfdir> <log> <candidate-json>: one full Bench run, first
# metric line (the per-query artifact) extracted to the candidate file
run_sf() {
  SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" \
    > "$2" 2>&1 || echo "$1 bench rc=$? (see $2)"
  grep -E '^\[info\] \{"metric"' "$2" | head -1 | sed 's/^\[info\] //' > "$3"
  grep -E '^\[info\] \{"metric"' "$2" | tail -1 | sed 's/^\[info\] //'
}

# guard <prev> <cand> <sfdir> <log>: re-run once on >25% oracle drift,
# then keep the LESS CONTENDED of the two readings (round-13 "what's
# wrong" #2: the re-run used to displace the first reading even when it
# was worse — a drift re-run on a still-contended host could stamp the
# worse of two sessions)
guard() {
  if ! python3 tools/bench_drift.py "$1" "$2" > /dev/null 2>&1; then
    echo "WARN: oracle drift >25% vs previous artifact at $3 — re-running once"
    cp "$2" "$2.first"
    run_sf "$3" "$4" "$2"
    best=$(python3 tools/bench_drift.py --pick "$2.first" "$2")
    if [ "$best" != "$2" ]; then
      echo "drift re-run was worse — keeping the first reading"
      cp "$best" "$2"
    fi
    rm -f "$2.first"
    python3 tools/bench_drift.py "$1" "$2" > /dev/null 2>&1 \
      || echo "WARN: drift persists after re-run at $3 — artifact flagged"
  fi
}

python3 tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sfscale/sf0.3 3

run_sf /root/testdata/sf0.1 /tmp/bench_sf01.log /tmp/cand_sf01.json
guard /tmp/prev_sf01.json /tmp/cand_sf01.json /root/testdata/sf0.1 /tmp/bench_sf01.log
python3 tools/bench_drift.py --stamp /tmp/prev_sf01.json /tmp/cand_sf01.json > BENCH_FULL.json

run_sf /tmp/sfscale/sf0.3 /tmp/bench_sf03.log /tmp/cand_sf03.json
guard /tmp/prev_sf03.json /tmp/cand_sf03.json /tmp/sfscale/sf0.3 /tmp/bench_sf03.log
python3 tools/bench_drift.py --stamp /tmp/prev_sf03.json /tmp/cand_sf03.json > BENCH_SF03.json

if [ "$SKIP_SF1" != "--skip-sf1" ]; then
  python3 tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sfscale/sf1 10
  run_sf /tmp/sfscale/sf1 /tmp/bench_sf1.log /tmp/cand_sf1.json
  guard /tmp/prev_sf1.json /tmp/cand_sf1.json /tmp/sfscale/sf1 /tmp/bench_sf1.log
  python3 tools/bench_drift.py --stamp /tmp/prev_sf1.json /tmp/cand_sf1.json > BENCH_SF1.json
fi

# Bench rewrote BENCH_FULL.json during the scaled runs — restore the
# stamped sf0.1 artifact as the repo-root headline
python3 tools/bench_drift.py --stamp /tmp/prev_sf01.json /tmp/cand_sf01.json > BENCH_SF_HEADLINE.tmp
mv BENCH_SF_HEADLINE.tmp BENCH_FULL.json

# Superlinearity gate (VERDICT r11 #3): the ngram-jaccard pair problem is
# the suite's one quadratic-risk operator — with the PPJoin positional
# filter its engine time must stay pair-output-proportional, i.e. sf1
# (10x data) <= ~8x the sf0.1 time plus contention headroom. WARN-only,
# like the drift guard: wall-clock on this box swings 40-60% under host
# contention, so the gate flags for adjudication rather than failing.
if [ "$SKIP_SF1" != "--skip-sf1" ]; then
  python3 - <<'PY'
import json
# dedup_ngram_jaccard: the one quadratic-risk operator (PPJoin must keep
# it pair-output-proportional). text_bpe_tokens: the batched trainer must
# stay rounds x vocab-job (vocab grows ~linearly in the hex-salted
# fixture; a superlinear reading means the per-round checkpoint or the
# pair aggregation regressed to corpus-scale work).
for q in ("dedup_ngram_jaccard", "text_bpe_tokens"):
    try:
        e01 = json.load(open("BENCH_FULL.json"))["queries"][q]
        e1 = json.load(open("BENCH_SF1.json"))["queries"][q]
        r = e1 / e01
        print(f"scaling gate {q}: sf1/sf0.1 engine = {r:.1f}x (threshold 8x)")
        if r > 8:
            print(f"WARN: {q} superlinear - sf1 {e1:.1f}s vs sf0.1 {e01:.1f}s; "
                  "adjudicate per the isolation protocol (BASELINE.md)")
    except Exception as e:
        print(f"scaling gate skipped for {q}: {e}")
PY
fi
echo "drift stamps:"
for f in BENCH_FULL.json BENCH_SF03.json BENCH_SF1.json; do
  [ -f "$f" ] && python3 -c "import json; d=json.load(open('$f')); print('$f', d.get('oracle_drift_vs_prev'), 'flag=', d.get('oracle_drift_flag'))"
done
