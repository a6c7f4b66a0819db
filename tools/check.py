#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (already compiled classes) on a given SF dir, then executes
each oracle SQL in DuckDB over the same parquet tables and compares:
  - schema: column names (sorted)
  - rows: row count
  - hash: values, columns sorted by name, rows in result order

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

def run_verify():
    cp = "/root/repo/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx8g", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", cp, "graft.Verify", SF, OUT])
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("STDERR:", line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)

def norm(df):
    import pandas as pd
    df = df[sorted(df.columns)]
    out = []
    for col in df.columns:
        s = df[col]
        out.append(s.map(lambda v: repr(v)))
    return pd.concat(out, axis=1)

def main():
    import duckdb, pandas as pd
    run_verify()
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # Any query Verify recorded as raising is a FAIL regardless of whether
    # it has an oracle entry — without this, a failed oracle-less query
    # surfaces as a plausible-looking "ROWS-ONLY rows=1" error marker.
    try:
        errs = json.load(open(f"{OUT}/_errors.json"))
    except Exception:
        errs = {}
    con = duckdb.connect()
    import pyarrow.parquet  # noqa
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    n_pass = n_fail = 0
    names = sorted(os.path.basename(p) for p in glob.glob(f"{OUT}/*")
                   if os.path.isdir(p))
    # completeness: every oracle entry must have an output dir — a query
    # that produced nothing is a FAILURE, not a smaller denominator
    # (round 6's events lane vanished from the gate exactly this way)
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: no spark output written")
        n_fail += 1
    # ... and a failed oracle-less query whose error marker also failed to
    # write would otherwise vanish from the denominator entirely
    for name in sorted(set(errs) - set(names) - set(oracle)):
        print(f"FAIL {name}: query raised: {errs[name]}")
        n_fail += 1
    for name in names:
        try:
            got = pd.read_parquet(f"{OUT}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if name in errs:
            print(f"FAIL {name}: query raised: {errs[name]}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_hash = False
        if ok_schema and ok_rows:
            g, e = norm(got), norm(exp)
            ok_hash = g.equals(e)
            if not ok_hash:
                diff = (g != e)
                bad = diff.any(axis=1)
                print(f"  first diffs for {name}:")
                print(pd.concat([g[bad].head(3), e[bad].head(3)],
                                keys=["got", "exp"]).to_string()[:2000])
        if ok_schema and ok_rows and ok_hash:
            print(f"PASS {name} rows={len(got)}")
            n_pass += 1
        else:
            print(f"FAIL {name} schema={ok_schema} rows={ok_rows}"
                  f" ({len(got)} vs {len(exp)}) hash={ok_hash}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)

main()
