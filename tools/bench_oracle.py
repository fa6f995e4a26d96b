# Times each oracle SQL in DuckDB (driver-side python) and prints one JSON
# object {query: seconds}. Invoked by graft.Bench as an optional subprocess
# so BENCH_r{N}.json can carry the per-query oracle denominator next to the
# engine timings (VERDICT r4 item 8). Fails soft: Bench omits the field.
import duckdb, json, sys, time

sfdir, sqljson = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['lineitem', 'orders', 'customer', 'supplier', 'part', 'nation',
          'region', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
out = {}
for name, sql in sorted(json.load(open(sqljson)).items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        out[name] = round(time.time() - t0, 4)
    except Exception:
        out[name] = None
print(json.dumps(out))
