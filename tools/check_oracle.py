#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]
Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf tables,
loads the Spark parquet dump, sorts columns by name + rows, and compares
row counts and value hashes. Dev tool only — not part of the library.
"""
import sys, os, json, glob, hashlib
import duckdb

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# Round-5 lesson: builder-local green does NOT imply driver green when
# the DuckDB versions differ (HUGEINT arrow export changed across
# versions). Log the version so any mirror/driver discrepancy is
# diagnosable from the transcript.
print(f"[check_oracle] duckdb {duckdb.__version__}")

con = duckdb.connect()
for t in TABLES:
    src = f"read_parquet('{sf}/{t}.parquet" + ("/*.parquet')" if os.path.isdir(f"{sf}/{t}.parquet") else "')")
    if t == "events":
        # ScaleUp-derived dirs store ts as raw BIGINT nanos (Spark cannot
        # write TIMESTAMP(NANOS)); rebuild the same micro-truncated
        # timestamp DuckDB derives from the original TIMESTAMP_NS column
        ts_type = con.execute(f"DESCRIBE SELECT ts FROM {src}").fetchall()[0][1]
        if ts_type == "BIGINT":
            con.execute(f"CREATE VIEW {t} AS SELECT event_id, "
                        f"make_timestamp(ts // 1000) AS ts, user_id, "
                        f"event_type, value, props FROM {src}")
            continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.17g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest(), len(df), list(df.columns)

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pq = os.path.join(out, name)
    files = glob.glob(os.path.join(pq, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    sh, sn, sc = canon(spark_df)
    dh, dn, dc = canon(duck_df)
    if sc != dc:
        print(f"FAIL {name}: schema {sc} vs {dc}"); fail += 1
    elif sn != dn:
        print(f"FAIL {name}: rows {sn} vs {dn}"); fail += 1
    elif sh != dh:
        print(f"FAIL {name}: hash mismatch ({sn} rows)")
        merged = spark_df[sorted(spark_df.columns)].sort_values(by=sorted(spark_df.columns)).reset_index(drop=True)
        dmerged = duck_df[sorted(duck_df.columns)].sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        diff = (merged.astype(str) != dmerged.astype(str))
        bad = diff.any(axis=1)
        print(merged[bad].head(3)); print(dmerged[bad].head(3))
        fail += 1
    else:
        print(f"OK   {name} ({sn} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
