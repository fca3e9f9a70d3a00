"""Convergence assertion for the fixed-unroll fixpoint oracles.

Each entry in /tmp/verify_out/convergence_sql.json (written by
graft.Verify from SparkEntry.convergenceSql) pairs an unrolled oracle at
its baked round count k with the same oracle at k+1. A fixpoint oracle
is valid only if the chain has converged by round k — i.e. the two
results are identical. This replaces the manual "re-check k vs k+1
after generator changes" step: run it whenever Synth constants or
oracle parameters change.

Usage: python3 tools/check_convergence.py [name ...]
(no args = all probes; names filter for fast iteration)
"""
import duckdb, json, glob, os, sys

sfdir = "/root/testdata/sf0.01"
out = "/tmp/verify_out"
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
probes = json.load(open(f"{out}/convergence_sql.json"))
only = set(sys.argv[1:])
failed = 0
for name, (sql_k, sql_k1) in sorted(probes.items()):
    if only and name not in only:
        continue
    try:
        a = con.execute(sql_k).fetchdf()
        b = con.execute(sql_k1).fetchdf()
    except Exception as e:
        print(f"{name}: PROBE SQL ERROR: {str(e)[:200]}")
        failed += 1
        continue
    a = a.reindex(sorted(a.columns), axis=1).sort_values(
        by=sorted(a.columns)).reset_index(drop=True)
    b = b.reindex(sorted(b.columns), axis=1).sort_values(
        by=sorted(b.columns)).reset_index(drop=True)
    if len(a) != len(b) or not a.equals(b):
        print(f"{name}: NOT CONVERGED at baked round count "
              f"(k rows={len(a)}, k+1 rows={len(b)})")
        failed += 1
    else:
        print(f"{name}: CONVERGED ({len(a)} rows stable)")
sys.exit(1 if failed else 0)
