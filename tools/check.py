#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run every oracle SQL
in DuckDB against the sf tables, load the Spark-side parquet dumps written
by graft.Verify, sort columns by name, and compare values exactly.

Usage: check.py [sfDir] [outDir]
"""
import duckdb, json, sys, math, datetime

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)

fails, passes = [], []
# rows-only check for queries without an oracle (mirrors the driver's
# weaker check): output parquet must exist and be readable
import glob as _glob
no_oracle = sorted(
    d.split("/")[-1] for d in _glob.glob(f"{outdir}/q*") if d.split("/")[-1] not in oracle)
for name in no_oracle:
    try:
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
        passes.append((f"{name} [rows-only]", n))
    except Exception as e:
        fails.append((name, f"rows-only ERROR: {e}"))

for name in sorted(oracle):
    sql = oracle[name]
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_cols = got_rel.columns
        got = got_rel.fetchall()
        exp_rel = con.sql(sql)
        exp_cols = exp_rel.columns
        exp = exp_rel.fetchall()
    except Exception as e:
        fails.append((name, f"ERROR: {e}"))
        continue
    if sorted(got_cols) != sorted(exp_cols):
        fails.append((name, f"schema: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"))
        continue
    # The driver's hash is TYPE-sensitive (round-1 lesson: DuckDB types an
    # un-cast integer SUM/count_if as HUGEINT while Spark emits BIGINT —
    # equal values, different hash). Compare declared column types too.
    got_types = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
    exp_types = {c: str(t) for c, t in zip(exp_cols, exp_rel.types)}
    type_mismatch = [(c, got_types[c], exp_types[c])
                     for c in sorted(got_cols) if got_types[c] != exp_types[c]]
    if type_mismatch:
        fails.append((name, "types: " + "; ".join(
            f"{c}: spark={g} oracle={e}" for c, g, e in type_mismatch)))
        continue
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    g = [tuple(norm(r[i]) for i in gi) for r in got]
    e = [tuple(norm(r[i]) for i in ei) for r in exp]
    if len(g) != len(e):
        fails.append((name, f"rows: spark={len(g)} oracle={len(e)}"))
        continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
    if bad:
        i, a, b = bad[0]
        fails.append((name, f"{len(bad)}/{len(g)} rows differ; first@{i} cols={sorted(got_cols)}\n  spark={a}\n  duck ={b}"))
    else:
        passes.append((name, len(g)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed, "
      f"{len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
