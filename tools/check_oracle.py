import duckdb, json, glob, os, sys
sfdir = "/root/testdata/sf0.01"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
# with an explicit outdir (dev subset runs), only check queries whose
# dump exists instead of erroring on the full oracle map
subset = len(sys.argv) > 1
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    if subset and not os.path.isdir(f"{out}/{name}"):
        continue
    try:
        o = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); continue
    try:
        s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"{name}: SPARK OUT READ ERROR: {e}"); continue
    o = o.reindex(sorted(o.columns), axis=1)
    s = s.reindex(sorted(s.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"{name}: SCHEMA MISMATCH oracle={list(o.columns)} spark={list(s.columns)}"); continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    if len(o) != len(s):
        print(f"{name}: ROWCOUNT MISMATCH oracle={len(o)} spark={len(s)}"); continue
    if o.equals(s):
        print(f"{name}: OK ({len(o)} rows)")
    else:
        neq = (o != s) & ~(o.isna() & s.isna())
        bad = neq.any(axis=1)
        print(f"{name}: VALUE MISMATCH in {bad.sum()}/{len(o)} rows")
        print(o[bad].head(3)); print(s[bad].head(3))
