#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares to the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted, exact value compare.

Driver-side tooling only (duckdb/pyarrow are not available to library code).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver's harness sorts rows on raw column values; list/array
    # cells are unhashable there and CRASH the gate (r9 q100). Mirror that
    # exactly — fail loudly instead of stringifying, so local green always
    # implies gate green. Digest array outputs to a scalar before
    # registering them.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     getattr(v, "ndim", 0) == 1).any():
            raise TypeError(
                f"column {c!r} holds array-typed cells — the driver gate "
                "cannot sort these (unhashable); register a scalar digest")
        # Canonicalize integer widths (int32 vs int64 is tolerated by the
        # driver) but do NOT silently coerce float/object — a DuckDB HUGEINT
        # (bare sum(BIGINT)) arrives as float64/object and must FAIL here.
        # uint64 only when every value fits int64 (astype would wrap);
        # pandas nullable extension ints (Int8..Int64/UInt*) canonicalize the
        # same way, but only when null-free (int64 can't hold NA).
        dt = str(df[c].dtype)
        # timestamp width is a storage detail (Spark parquet = ns,
        # DuckDB .df() = us); the driver tolerates it — canonicalize
        if dt in ("datetime64[us]", "datetime64[ms]", "datetime64[s]"):
            df[c] = df[c].astype("datetime64[ns]")
        if dt in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
        elif dt == "uint64":
            if len(df) == 0 or df[c].max() <= 2**63 - 1:
                df[c] = df[c].astype("int64")
        elif dt in ("Int8", "Int16", "Int32", "Int64",
                    "UInt8", "UInt16", "UInt32", "UInt64"):
            if not df[c].isna().any() and (
                    len(df) == 0 or dt != "UInt64" or df[c].max() <= 2**63 - 1):
                df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        try:
            a, b = norm(spark_df), norm(duck_df)
        except TypeError as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
