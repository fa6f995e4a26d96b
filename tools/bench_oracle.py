# Times each oracle SQL in DuckDB (driver-side python) and prints one JSON
# object {query: seconds}. Invoked by graft.Bench as an optional subprocess
# so BENCH_r{N}.json can carry the per-query oracle denominator next to the
# engine timings (VERDICT r4 item 8). Fails soft: Bench omits the field.
#
# GRAFT_ORACLE_REPEAT=N (default 1): execute each SQL N times and keep the
# MINIMUM — the oracle-leg counterpart of Bench's engine-side steal guard.
# This host's noisy-neighbor CPU windows inflate single-execution DuckDB
# readings (round-13 sweep: shared-query oracle totals +24-47% vs the
# previous session on identical SQL+data), which flatters the engine/oracle
# ratio; repeat-min trades wall clock for a denominator that survives a
# steal window. Left at 1 by default — the full suite's oracle leg is
# ~10 min at sf1 and doubling it is a deliberate choice per run.
import duckdb, json, os, sys, time

sfdir, sqljson = sys.argv[1], sys.argv[2]
repeat = max(1, int(os.environ.get("GRAFT_ORACLE_REPEAT", "1")))
con = duckdb.connect()
for t in ['lineitem', 'orders', 'customer', 'supplier', 'part', 'nation',
          'region', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
out = {}
for name, sql in sorted(json.load(open(sqljson)).items()):
    best = None
    for _ in range(repeat):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        except Exception:
            # a failure on ANY repeat voids the timing: keeping an
            # earlier-success min would report a partially-failed query
            # as timed, diverging from the single-run fail-soft semantics
            best = None
            break
    out[name] = round(best, 4) if best is not None else None
print(json.dumps(out))
