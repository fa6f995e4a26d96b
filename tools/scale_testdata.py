#!/usr/bin/env python3
"""Structure-preserving scale-up of the driver testdata (driver-side tool).

Concatenates COPIES offset replicas of every scaling table so joins,
residue-class plants, and dup structure survive:

- every int64 entity key shifts by copy*BASE, with BASE = 2^2*3*5*7*13*17*37
  = 3,434,340 — divisible by every residue modulus the bench queries use
  (2,3,4,5,7,10,13,17,37), so planted-PII/footer/twin fractions are
  identical per copy; BASE > 1,000,000 keeps the queries' own +1e6
  near-dup twins collision-free,
- region/nation stay fixed (TPC-H dims do not scale),
- documents get a normalization-stable per-copy token suffix (" copyqN"
  stays ONE token under [^a-z0-9]+ splitting), so intra-copy dup
  structure is preserved without creating cross-copy exact dups —
  see BASELINE.md round-7 postmortem: a separator-splittable suffix
  creates degenerate (suffix, word, suffix) grams whose df explodes,
- embeddings circular-shift by the copy index (norms and intra-copy
  cosine structure preserved; copies are not near-dups of each other),
- events keep their timestamps (same temporal windows, disjoint users).

Usage: python3 tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sfscale/sf0.3 3
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

BASE = 3434340

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def scale_table(name, src, copies):
    t = pq.read_table(f"{src}/{name}.parquet")
    out = [t]
    for c in range(1, copies):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            if field in KEY_COLS[name]:
                cols[field] = pa.compute.add(col, c * BASE).cast(col.type)
            elif name == "documents" and field == "text":
                cols[field] = pa.compute.binary_join_element_wise(
                    col.cast(pa.string()), f" copyq{c}", "")
            elif name == "documents" and field == "n_chars":
                pass  # recomputed below from the suffixed text
            elif name == "embeddings" and field == "embedding":
                shifted = [v[c % len(v):] + v[: c % len(v)] if v else v
                           for v in col.to_pylist()]
                cols[field] = pa.array(shifted, type=col.type)
            else:
                cols[field] = col
        if name == "documents":
            cols["n_chars"] = pa.compute.utf8_length(
                cols["text"]).cast(t.column("n_chars").type)
        copy = pa.table(
            {f: cols[f] for f in t.schema.names}).cast(t.schema)
        out.append(copy)
    return pa.concat_tables(out)


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} (fixed)")
    for name in KEY_COLS:
        t = scale_table(name, src, copies)
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows}")


if __name__ == "__main__":
    main()
