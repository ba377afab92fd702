#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running the oracle SQL on the same fixture dir.
Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def kind(df: pd.DataFrame):
    """int-vs-float per column. The driver's hash is repr-sensitive, so a
    DuckDB HUGEINT (pandas float64, e.g. an uncast sum() over BIGINT)
    against a Spark int64 mismatches there (1435.0 vs 1435) even when the
    values are equal — flag it here instead of silently normalizing."""
    return ["i" if pd.api.types.is_integer_dtype(df[c])
            else "f" if pd.api.types.is_float_dtype(df[c]) else "o"
            for c in df.columns]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints → int64, floats → float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def compare(sf_dir, out_dir):
    """Compare one Verify dump against DuckDB on the same fixture dir.
    Returns {query_name: status_string} — importable (degen_check.py
    builds CORRECTNESS_DEGEN.json from it)."""
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are plain files; Spark-derived fixtures
        # (MakeDegen/MakeScale) are directory-shaped parquet
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})" if len(spark_df) > 0 else "ROWS_ONLY_EMPTY"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif kind(a) != kind(b):
            bad = [c for c, x, y in zip(a.columns, kind(a), kind(b)) if x != y]
            results[name] = f"DTYPE_MISMATCH (driver hash is repr-sensitive) cols={bad}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
                results[name] = "MATCH"
            except AssertionError as e:
                # find first differing cell for debugging
                diff = None
                for c in a.columns:
                    neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    if neq.any():
                        i = neq.idxmax()
                        diff = f"col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r}"
                        break
                results[name] = f"VALUE_MISMATCH {diff}"
    return results

def main(sf_dir, out_dir):
    results = compare(sf_dir, out_dir)
    n_match = sum(1 for v in results.values() if v == "MATCH")
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY("))
    for k, v in sorted(results.items()):
        flag = "  OK " if v == "MATCH" or v.startswith("ROWS_ONLY(") else "FAIL "
        print(f"{flag}{k}: {v}")
    print(f"\n{n_match} oracle-matched, {n_rows_only} rows-only-ok, "
          f"{len(results) - n_match - n_rows_only} failing, {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
