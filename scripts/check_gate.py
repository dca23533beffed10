#!/usr/bin/env python3
"""Dev-only gate self-check (mimics the driver's DuckDB compare).

Usage: python3 scripts/check_gate.py <sfDir> <verifyOutDir>
Run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first.
NOT part of the library — duckdb/pyarrow are host tools only.
"""
import sys, json, glob, os
import duckdb

def main(sf, out):
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"create view {name} as select * from '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    qdirs = [d for d in sorted(os.listdir(out)) if os.path.isdir(f"{out}/{d}")]
    # an oracle entry whose dump dir is missing means the Spark query THREW —
    # silently skipping it would mask the failure
    for q in sorted(set(oracle) - set(qdirs)):
        print(f"  {q:24s} MISSING DUMP (query failed in Verify)")
        failures += 1
    for q in qdirs:
        spark_df = con.execute(
            f"select * from '{out}/{q}/*.parquet'").fetch_arrow_table().to_pandas()
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
        if q not in oracle:
            print(f"  {q:24s} rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            if len(spark_df) == 0: failures += 1
            continue
        try:
            duck_df = con.execute(oracle[q]).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"  {q:24s} ORACLE SQL ERROR: {e}"); failures += 1; continue
        duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
        ok_schema = list(spark_df.columns) == list(duck_df.columns)
        ok_rows = len(spark_df) == len(duck_df)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                a = spark_df.reset_index(drop=True)
                b = duck_df.reset_index(drop=True).astype(a.dtypes.to_dict())
                ok_vals = a.equals(b)
                if not ok_vals:
                    neq = (a.fillna('__N') != b.fillna('__N')).any(axis=1)
                    bad = neq[neq].index[:3]
                    for i in bad:
                        print(f"      row {i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}")
            except Exception as e:
                print(f"      compare error: {e}")
        status = "PASS" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"  {q:24s} {status} schema={ok_schema} "
                  f"rows={len(spark_df)}/{len(duck_df)} vals={ok_vals}")
            if not ok_schema:
                print(f"      spark cols: {list(spark_df.columns)}")
                print(f"      duck  cols: {list(duck_df.columns)}")
        else:
            print(f"  {q:24s} PASS ({len(spark_df)} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
