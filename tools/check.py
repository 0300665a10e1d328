#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL, per query.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-written dirs (e.g. the
        # ScaleData 8x/32x copies) need a part-file glob
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # driver testdata stores events.ts as TIMESTAMP(NANOS); Spark-rewritten
    # copies (tools/ScaleData) carry it as BIGINT nanos because the session
    # reads nanos-as-long. Mirror Tables.events' truncation so oracles see
    # the same microsecond TIMESTAMP either way.
    if con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0] == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS "
                    "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{sf_dir}/events.parquet/*.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # queries that threw inside Verify (e.g. a table-load failure): an
    # explicit red row, NEVER a silently-absent one — and the error must
    # WIN over any stale dump dir left by a previous Verify run into the
    # same out_dir (a plan-construction throw never deletes the old dump,
    # which would otherwise compare green against the oracle)
    err_path = f"{out_dir}/errors.json"
    verify_errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in verify_errors:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            # a write that failed mid-job leaves a dir with no part files;
            # red row, not an uncaught read_parquet([]) crash that would
            # kill the whole report
            results[name] = {"error": "dump dir has no parquet part files"}
            continue
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            results[name] = {"rows": len(spark_df), "oracle": None,
                             "ok": len(spark_df) > 0}
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {e}"}
            continue
        a, b = canon(spark_df), canon(duck_df)
        schema_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        hash_ok = False
        detail = ""
        if schema_ok and rows_ok:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                # the driver hashes STRINGIFIED values, so an int column on
                # one side vs float on the other (e.g. DuckDB HUGEINT ->
                # pandas float64) mismatches there even when values coerce
                # equal here — enforce matching dtype kinds too
                kinds = [(c, a[c].dtype.kind, b[c].dtype.kind)
                         for c in a.columns
                         if a[c].dtype.kind != b[c].dtype.kind]
                if kinds:
                    detail = f"dtype-kind mismatch (driver would hash-fail): {kinds}"
                else:
                    hash_ok = True
            except AssertionError as e:
                detail = str(e).split("\n")[0][:200]
        else:
            detail = (f"spark cols={list(a.columns)} rows={len(a)} vs "
                      f"duck cols={list(b.columns)} rows={len(b)}")[:300]
        results[name] = {"rows": len(a), "schema": schema_ok,
                         "rowcount": rows_ok, "exact": hash_ok,
                         "detail": detail}
    for name, msg in verify_errors.items():
        results[name] = {"error": f"query failed in Verify: {msg}"}
    ok = sum(1 for r in results.values()
             if r.get("exact") or (r.get("oracle") is None and r.get("ok")))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {ok}/{len(results)} green")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
