#!/usr/bin/env python3
"""Local dev harness mirroring the driver's t2 correctness gate:
runs Verify's dumped parquet results against DuckDB executing
SparkEntry.oracleSql on the same tables, compares exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def load_spark(outdir, name):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        return None
    return pq.read_table(f'{outdir}/{name}').to_pandas()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
                isinstance(x, int) for x in df[c].dropna().head(5)):
            try:
                df[c] = df[c].astype('float64') if df[c].isna().any() else df[c].astype('int64')
            except (ValueError, TypeError, OverflowError):
                pass
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype('datetime64[us]')
        if df[c].dtype == object:
            # decimals -> float? keep str compare for decimals
            import decimal
            if any(isinstance(x, decimal.Decimal) for x in df[c].dropna().head(5)):
                df[c] = df[c].astype('float64')
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

INT_DUCK = ('TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT',
            'UTINYINT', 'USMALLINT', 'UINTEGER', 'UBIGINT')

def dtype_parity(name, a, b, duck_types):
    """Mirror the driver's hash sensitivity: an int64 Spark column vs a
    float64 DuckDB column (e.g. HUGEINT from SUM(BIGINT) -> pandas float)
    hashes differently even when every value is equal.

    Primary check uses DuckDB's DECLARED result types (DESCRIBE <query>),
    so HUGEINT is caught even when the column carries NULLs — a nullable
    HUGEINT becomes float64-with-NaN in pandas, which the old
    post-conversion-dtype check exempted. Falls back to the pandas-dtype
    heuristic when declared types are unavailable."""
    errs = []
    for c in sorted(set(a.columns) & set(b.columns)):
        av, bv = a[c], b[c]
        ai = pd.api.types.is_integer_dtype(av)
        af = pd.api.types.is_float_dtype(av)
        decl = duck_types.get(c, '').upper()
        # only a RECOGNIZED declared type settles the question; anything
        # else (DECIMAL, VARCHAR, ...) must still fall through to the
        # pandas-dtype heuristic below, or those classes go unchecked
        if decl.startswith(('HUGEINT', 'UHUGEINT')):
            if ai or af:
                errs.append(f'{name}: DTYPE col={c} spark={av.dtype} duck declared {decl} '
                            f'(wrap the oracle aggregate in CAST ... AS BIGINT)')
            continue
        if decl.startswith(INT_DUCK):
            if af and not av.isna().any():
                errs.append(f'{name}: DTYPE col={c} spark={av.dtype} duck declared {decl}')
            continue
        if decl.startswith(('DOUBLE', 'FLOAT', 'REAL')):
            if ai:
                errs.append(f'{name}: DTYPE col={c} spark={av.dtype} duck declared {decl}')
            continue
        bi, bf = pd.api.types.is_integer_dtype(bv), pd.api.types.is_float_dtype(bv)
        if ai and bf and not bv.isna().any():
            errs.append(f'{name}: DTYPE col={c} spark={av.dtype} duck={bv.dtype} '
                        f'(oracle likely needs CAST ... AS BIGINT — DuckDB HUGEINT?)')
        elif bi and af and not av.isna().any():
            errs.append(f'{name}: DTYPE col={c} spark={av.dtype} duck={bv.dtype}')
    return errs

def compare(name, a, b, duck_types=None):
    if a is None:
        return f'{name}: MISSING spark output'
    if list(sorted(a.columns)) != list(sorted(b.columns)):
        return f'{name}: COLUMN MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}'
    dt = dtype_parity(name, a, b, duck_types or {})
    if dt:
        return '; '.join(dt)
    a, b = norm(a.copy()), norm(b.copy())
    if len(a) != len(b):
        return f'{name}: ROWCOUNT spark={len(a)} duck={len(b)}'
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype('float64'); bv = bv.astype('float64')
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = np.nanmax(np.abs(av - bv))
                return (f'{name}: VALUE col={c} row={bad} spark={av[bad]!r} '
                        f'duck={bv[bad]!r} maxabsdiff={diff:.3e}')
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return f'{name}: VALUE col={c} row={bad} spark={av[bad]!r} duck={bv[bad]!r}'
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    failures = []
    for name in sorted(oracle):
        try:
            duck = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append(f'{name}: DUCKDB ERROR {e}')
            continue
        # declared result types (NULL-proof, unlike post-pandas dtypes)
        try:
            duck_types = {r[0]: r[1] for r in
                          con.execute(f'DESCRIBE {oracle[name]}').fetchall()}
        except Exception:
            duck_types = {}
        try:
            spark = load_spark(outdir, name)
            err = compare(name, spark, duck, duck_types)
        except Exception as e:
            err = f'{name}: COMPARE ERROR {type(e).__name__} {e}'
        if err:
            failures.append(err)
        else:
            print(f'  ok {name} ({len(duck)} rows)')
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f'{outdir}/*/')):
        name = os.path.basename(d.rstrip('/'))
        if name not in oracle:
            df = load_spark(outdir, name)
            print(f'  rows-only {name}: {0 if df is None else len(df)} rows')
    print()
    if failures:
        print(f'{len(failures)} FAILURES:')
        for f in failures:
            print(' ', f)
        sys.exit(1)
    print(f'ALL {len(oracle)} oracle queries MATCH')

if __name__ == '__main__':
    main()
