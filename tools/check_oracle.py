#!/usr/bin/env python3
"""Dev-loop emulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet
tables, and compares: row count, column names (sorted), and a hash of
the value multiset. NOT shipped library code — dev tool only.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string rendering per cell
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: 'NULL' if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.astype('datetime64[us]').map(
                lambda v: 'NULL' if pd.isna(v) else v.isoformat())
        else:
            out[c] = col.map(lambda v: 'NULL' if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(('\x1f'.join(map(str, row)) + '\x1e').encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings']:
        p = f'{sf_dir}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_pass = n_fail = n_noracle = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f'{d}/*.parquet')
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f'  {name:32s} NO-ORACLE rows={len(spark_df)}')
            n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f'  {name:32s} ORACLE-SQL-ERROR {str(e)[:120]}')
            n_fail += 1
            continue
        a, b = norm_df(spark_df), norm_df(duck_df)
        cols_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        hash_ok = cols_ok and rows_ok and df_hash(a) == df_hash(b)
        if hash_ok:
            print(f'  {name:32s} PASS rows={len(a)}')
            n_pass += 1
        else:
            print(f'  {name:32s} FAIL cols_ok={cols_ok} rows {len(a)} vs {len(b)}')
            if cols_ok and rows_ok:
                diff = pd.concat([a, b]).drop_duplicates(keep=False)
                print(diff.head(6).to_string())
            else:
                print('   spark cols:', list(a.columns))
                print('   duck  cols:', list(b.columns))
            n_fail += 1
    # a query that CRASHED in Verify never writes its dir — without
    # this check it silently vanishes from the counts (it did once:
    # a2c failed under a mis-flagged JVM and the sweep still said
    # FAIL=0; grep Verify's stderr for [verify] lines too)
    written = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    missing = sorted(set(oracle) - written)
    # ...but a SUBSET dev run (Verify's 3rd arg) legitimately writes
    # few dirs. Verify DECLARES subset runs via a marker file — no
    # ratio inference (a full run where >10% of queries crashed used
    # to pass for a subset run and skip its MISSING report)
    full_run = not os.path.exists(os.path.join(out_dir, 'subset_run.txt'))
    if full_run:
        for name in missing:
            print(f'  {name:32s} MISSING (no Verify output dir)')
    print(f'PASS={n_pass} FAIL={n_fail} NO-ORACLE={n_noracle}'
          + (f' MISSING={len(missing)}' if full_run and missing else ''))
    return 1 if n_fail or (full_run and missing) else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
