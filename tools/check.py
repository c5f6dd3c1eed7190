#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads the Spark result parquet from
<outDir>/<name>/, sorts columns by name (the driver does this before
hashing), and compares row-by-row rendered values.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import datetime as dt
import duckdb
import numpy as np
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def render(v, f32=False):
    if v is None:
        return "NULL"
    if v != v:
        # distinct token: NaN-vs-NULL divergence must FAIL, not pass (ADVICE r2)
        return "NaN"
    if f32:
        # pandas itertuples widens float32 to float64 ('0.37000000476837158');
        # shortest-repr of the 32-bit value is what both engines print.
        return np.format_float_positional(np.float32(v), trim="0")
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    # DATE canonicalization: duckdb.fetchdf widens DATE to a midnight
    # datetime64 while pyarrow keeps datetime.date. The gate never
    # distinguished date-vs-midnight-timestamp (both sides used to route
    # through duckdb), so keep that equivalence explicitly.
    if isinstance(v, dt.datetime):
        # TZ canonicalization (r18): Spark writes timestamp[us, tz=UTC]
        # parquet, so pyarrow hands tz-AWARE datetimes, while the DuckDB
        # session (TimeZone=UTC) fetches naive UTC walls — identical
        # instants rendered "…+00:00" vs bare were 9 phantom FAILs. Both
        # sides are UTC walls; strip the awareness before rendering.
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        if v.time() == dt.time(0):
            return v.date().isoformat()
        return str(v)
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)

def rows_of(df, cols):
    f32 = [str(df[c].dtype) == "float32" for c in cols]
    return [tuple(render(v, f) for v, f in zip(r, f32))
            for r in df[cols].itertuples(index=False)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    err_path = os.path.join(out_dir, "errors.json")
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    n_pass = n_fail = 0
    # Entries that crashed in Verify surface as FAIL rows here even when they
    # have no oracle SQL — a crashed entry must never vanish (VERDICT r9 #2).
    for name in sorted(set(errors) - set(oracles)):
        print(f"FAIL {name}: verify crashed: {errors[name]}")
        n_fail += 1
    for name in sorted(oracles):
        sql = oracles[name]
        # A crashed entry fails UNCONDITIONALLY, before any file check:
        # Verify writes with overwrite, so a reused out_dir keeps the
        # previous run's parquet when fn() throws pre-write — comparing
        # that stale output would silently PASS a crashed entry (ADVICE r10).
        if name in errors:
            print(f"FAIL {name}: verify crashed: {errors[name]}")
            n_fail += 1
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        # Read the Spark parquet via pyarrow, NOT DuckDB: the driver's gate
        # renders the Spark side Decimal-preservingly ("834392.70"), while a
        # DuckDB route put both sides on one rendering path and masked the
        # p42_sql_decimal trailing-zero divergence (VERDICT r15 #2).
        spark = pq.ParquetDataset(sorted(spark_files)).read().to_pandas()
        dc, sc = sorted(duck.columns), sorted(spark.columns)
        if dc != sc:
            print(f"FAIL {name}: columns duck={dc} spark={sc}")
            n_fail += 1
            continue
        drows = rows_of(duck, dc)
        srows = rows_of(spark, sc)
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount duck={len(drows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(drows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(drows)} rows differ; first at {i}:")
            print(f"  cols : {dc}")
            print(f"  duck : {a}")
            print(f"  spark: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(drows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
