#!/usr/bin/env python3
"""Local pre-check replicating the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each <outDir>/<name> parquet against DuckDB
executing <outDir>/oracle_sql.json on the same tables.

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Width-normalize dtypes (int32→int64, datetime us→ns) but KEEP the
    # int-vs-float distinction: the driver hashes values, so width never
    # matters but an int64-vs-float64 drift (e.g. DuckDB HUGEINT sums
    # materializing as float) must fail here exactly as it fails there.
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif dt.startswith('float'):
            df[c] = df[c].astype('float64').round(6)
        elif dt.startswith('int') or dt.startswith('uint'):
            df[c] = df[c].astype('int64')
        elif 'datetime' in dt:
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) \
                      .astype('datetime64[ns]')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for d in sorted(glob.glob(os.path.join(out_dir, 'q*'))):
        name = os.path.basename(d)
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              glob.glob(os.path.join(d, '*.parquet'))],
                             ignore_index=True)
        if name not in oracle:
            print(f"{name:24s} rows-only: {len(spark_df)} rows")
            continue
        duck_df = con.execute(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:24s} COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"{name:24s} ROWCOUNT {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        try:
            # check_dtype=True: the driver hashes raw values, so a
            # float64-vs-int64 dtype drift (e.g. DuckDB HUGEINT sums)
            # must fail here too, not pass silently.
            pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                          check_exact=False, rtol=1e-6)
            print(f"{name:24s} OK ({len(a)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"{name:24s} VALUE MISMATCH: {str(e)[:300]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} mismatched")
    return 1 if n_bad else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
