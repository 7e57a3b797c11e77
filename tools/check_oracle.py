#!/usr/bin/env python3
"""Local dev harness mirroring the driver's t2 correctness gate:
runs Verify's dumped parquet results against DuckDB executing
SparkEntry.oracleSql on the same tables, compares exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--lax]

Strict mode (the default) mirrors the driver's hash sensitivity one step
further than dtype_parity: cells are compared by canonical string
rendering with NO decimal->float normalization, and any decimal.Decimal
output column is itself a failure (the driver's hasher diverged on the
only raw-DECIMAL column ever shipped, q128 round 7, even though every
value matched — the representation surface is untestable locally, so ban
it). --lax restores the old float-normalized compare.
"""
import sys, os, json, glob
import decimal
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

STRICT = '--lax' not in sys.argv

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
        if df[c].dtype == object and not STRICT:
            # lax mode only: decimals normalized to float64 (this hid the
            # q128 driver divergence; strict mode flags decimals instead)
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

def canon(x):
    """Canonical cell rendering for the strict compare. Unlike astype(str),
    this never truncates (numpy str elides long arrays with '...'), tags
    decimals/bytes distinctly, and renders float64 via repr (shortest
    round-trip == bitwise compare). float32 cells use numpy's own shortest
    repr so a float32 Spark column widened against a DOUBLE oracle column
    compares by printed value, as the lax path always did."""
    if x is None:
        return '∅'
    if isinstance(x, np.floating):
        if np.isnan(x):
            return 'NaN'
        return str(x) if x.itemsize == 4 else repr(float(x))
    if isinstance(x, float):
        return 'NaN' if np.isnan(x) else repr(x)
    if isinstance(x, bool) or isinstance(x, np.bool_):
        return str(bool(x))
    if isinstance(x, (np.integer, int)):
        return str(int(x))
    if isinstance(x, decimal.Decimal):
        return 'DEC:' + str(x)
    if isinstance(x, (bytes, bytearray)):
        return 'B:' + bytes(x).hex()
    if isinstance(x, (list, tuple, np.ndarray)):
        return '[' + ','.join(canon(e) for e in x) + ']'
    if isinstance(x, dict):
        return '{' + ','.join(f'{k}:{canon(v)}' for k, v in sorted(x.items())) + '}'
    if x is pd.NaT:
        return '∅'
    return str(x)

def find_decimals(name, a, b):
    """Strict mode bans decimal.Decimal output columns outright: the
    driver's hasher diverged on the only one ever shipped (q128, round 7)
    with every value equal, so the surface cannot be validated locally."""
    errs = []
    for side, df in (('spark', a), ('duck', b)):
        for c in df.columns:
            if df[c].dtype == object and any(
                    isinstance(x, decimal.Decimal) for x in df[c].dropna()):
                errs.append(f'{name}: STRICT DECIMAL col={c} side={side} — '
                            f'raw decimal output is an untested driver-hash '
                            f'surface; CAST to BIGINT or DOUBLE on both sides')
    return errs

def compare(name, a, b, duck_types=None):
    if a is None:
        return f'{name}: MISSING spark output'
    if list(sorted(a.columns)) != list(sorted(b.columns)):
        return f'{name}: COLUMN MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}'
    dt = dtype_parity(name, a, b, duck_types or {})
    if dt:
        return '; '.join(dt)
    if STRICT:
        dec = find_decimals(name, a, b)
        if dec:
            return '; '.join(dec)
    a, b = norm(a.copy()), norm(b.copy())
    if len(a) != len(b):
        return f'{name}: ROWCOUNT spark={len(a)} duck={len(b)}'
    for c in a.columns:
        av, bv = a[c], b[c]
        if STRICT and not (pd.api.types.is_float_dtype(av)
                           and pd.api.types.is_float_dtype(bv)):
            ca, cb = av.map(canon), bv.map(canon)
            eq = ca == cb
            if not eq.all():
                bad = (~eq).idxmax()
                return (f'{name}: STRICT VALUE col={c} row={bad} '
                        f'spark={ca[bad]!r} duck={cb[bad]!r}')
            continue
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
