import duckdb, json, glob, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['documents','embeddings','lineitem','orders','events','customer','supplier','part','nation','region']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f'{out}/{name}/*.parquet')])
        # driver-style: sort columns by name, sort rows, compare
        want = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
        got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
        if list(want.columns) != list(got.columns):
            fails.append((name, f'schema: {list(got.columns)} vs {list(want.columns)}')); continue
        if len(want) != len(got):
            fails.append((name, f'rows: {len(got)} vs {len(want)}')); continue
        # exact compare with float tolerance 0 (values should match post-round)
        eq = True
        for c in want.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                    bad = (a.astype(float) != b.astype(float)).sum()
                    eq = False; fails.append((name, f'col {c}: {bad} float mismatches, e.g. {a[a.astype(float)!=b.astype(float)].head(2).tolist()} vs {b[a.astype(float)!=b.astype(float)].head(2).tolist()}')); break
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    bad = (a.astype(str) != b.astype(str)).sum()
                    eq = False; fails.append((name, f'col {c}: {bad} mismatches, got {a[a.astype(str)!=b.astype(str)].head(2).tolist()} want {b[a.astype(str)!=b.astype(str)].head(2).tolist()}')); break
        if eq: print(f'{name}: OK ({len(got)} rows)')
    except Exception as e:
        fails.append((name, 'EXC ' + str(e)[:200]))
for n, r in fails: print(f'{n}: FAIL {r}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match')
