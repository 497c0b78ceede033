#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet under OUT_DIR, run the matching oracle SQL (oracle_sql.json) in
DuckDB over the same testdata parquet tables, sort columns by name,
compare row count, schema, and value hash. Dev tool only — not part of
the library."""
import json, sys, math
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        # %.17g is round-trip precision for float64, and the "f:" tag keeps
        # a float64 column from matching an int64 one — DuckDB sum(int)
        # returns HUGEINT which pandas widens to float64, so an uncast
        # oracle sum vs a Spark bigint hashed equal at %.9g while the
        # driver's raw-value hash failed (round-1 lesson).
        return f"f:{v:.17g}"
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()
        if isinstance(v, (int, float)): return norm(float(v)) if isinstance(v, float) else str(v)
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
        s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
        if s_cols != o_cols:
            fails.append(name); print(f"FAIL {name}: cols spark={s_cols} oracle={o_cols}"); continue
        if len(spark_df) != len(oracle_df):
            fails.append(name); print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(oracle_df)}"); continue
        sv = sorted(tuple(norm(v) for v in row) for row in spark_df[s_cols].itertuples(index=False))
        ov = sorted(tuple(norm(v) for v in row) for row in oracle_df[o_cols].itertuples(index=False))
        if sv != ov:
            fails.append(name)
            diff = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {type(e).__name__}: {e}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
