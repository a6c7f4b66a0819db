#!/usr/bin/env python3
"""Side-by-side throughput: graft (Spark, steady-state) vs DuckDB running
the oracle SQL on the same parquet, same machine.

Usage: python3 tools/bench_compare.py [sfdir] > BENCH_NOTES.md
Requires a prior `sbt compile` and /tmp/graft_verify/oracle_sql.json
(produced by tools/check.py or graft.Verify).
"""
import json, subprocess, sys, glob, os, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

def spark_bench():
    cp = "/root/repo/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    r = subprocess.run(
        ["java"] + ADD_OPENS + ["-Xmx16g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench"],
        capture_output=True, text=True, env=env)
    # per-query medians live in the DETAIL line (the contract line is
    # size-bounded and only carries the slowest-10); spread fields come
    # along for free
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    detail = next(json.loads(l) for l in lines if '"total_detail"' in l)
    detail["queries"] = {k: v["med"] for k, v in detail["queries"].items()}
    # maint rows ride the DETAIL line at full precision (the contract
    # line rounds to 2 dp); prefer them there, fall back to the
    # contract for older artifacts. Fallback rows that ROUND TO ZERO
    # are dropped rather than committed (round-20, r19 advice item 3):
    # a 0.0 reference makes the 3x maint guard degenerate to its 0.2 s
    # absolute floor for that row on every future run.
    if "maint" not in detail:
        contract = next((json.loads(l) for l in lines
                         if '"metric":"total"' in l), {})
        detail["maint"] = {k: v for k, v in contract.get("maint", {}).items()
                           if isinstance(v, (int, float)) and v > 0.0}
    return detail

def duckdb_bench(oracle):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    times = {}
    for name, sql in oracle.items():
        con.execute(sql).fetchall()  # warm
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        times[name] = sorted(runs)[1]  # median of 3
    return times

def gen_hash(rows):
    """12-hex content hash over the data rows — graft.Bench recomputes
    this and carries it as `baseline_gen` in the contract line, so two
    rounds' ratios are machine-checkably same-denominator; a recorded
    #gen that disagrees with the content drops the ratio."""
    import hashlib
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:12]

def write_tsv(fname, desc, meds):
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), fname)
    rows = [f"{name}\t{meds[name]:.4f}" for name in sorted(meds)]
    with open(out, "w") as f:
        f.write(f"# {desc}\n")
        f.write("# Written by tools/bench_compare.py; consumed by "
                "graft.Bench (like_for_like / suspect contract fields).\n")
        f.write(f"#sf\t{os.path.basename(SF.rstrip('/'))}\n")
        # host tag: graft.Bench renames like_for_like to
        # cross_machine_ratio (and disables the suspect guard) when the
        # bench host differs — a committed baseline must never silently
        # normalize another machine's runs
        f.write(f"#host\t{os.uname().nodename}\n")
        f.write(f"#gen\t{gen_hash(rows)}\n")
        for r in rows:
            f.write(r + "\n")

def write_baseline(db):
    """Persist the DuckDB per-query medians as the committed baseline
    graft.Bench folds into its contract line (like_for_like): one
    `name<TAB>seconds` row per oracle query, tagged with the SF so a
    bench at a different scale never divides by the wrong numbers."""
    write_tsv("duckdb_baseline.tsv",
              "DuckDB oracle per-query seconds (median of 3, warm), "
              "same machine/parquet as the Spark bench.", db)

def write_spark_meds(sb, maint=None):
    """Persist the Spark per-query medians from THIS clean window as
    the suspect-guard reference: graft.Bench flags any run whose med
    exceeds 2x these numbers on the same sf + host. Maintenance rows
    (from the contract line's `maint` map) are carried as
    `maint:<name>` rows — graft.Bench's round-19 maint contamination
    guard compares against them at 3x."""
    meds = dict(sb)
    for name, v in (maint or {}).items():
        if isinstance(v, (int, float)) and v >= 0:
            meds[f"maint:{name}"] = float(v)
    write_tsv("spark_meds.tsv",
              "graft.Bench per-query seconds (median of 3, warm) from a "
              "clean window - the suspect-guard reference.", meds)

def main():
    oracle = json.load(open("/tmp/graft_verify/oracle_sql.json"))
    sb = spark_bench()
    db = duckdb_bench(oracle)
    write_baseline(db)
    write_spark_meds(sb["queries"], sb.get("maint"))
    print(f"# Bench notes — graft vs DuckDB oracle at {SF}")
    print()
    print("Both warm (steady state), same machine, same parquet inputs.")
    print("DuckDB has no entry for rows-only queries.")
    print()
    print("| query | spark s | duckdb s | ratio (spark/duckdb) |")
    print("|---|---|---|---|")
    total_s = total_d = 0.0
    for name in sorted(sb["queries"]):
        s = sb["queries"][name]
        d = db.get(name)
        total_s += s
        if d is None:
            print(f"| {name} | {s:.2f} | — | — |")
        else:
            total_d += d
            print(f"| {name} | {s:.2f} | {d:.2f} | {s / max(d, 1e-9):.1f}x |")
    print(f"| **total** | **{total_s:.1f}** | **{total_d:.1f}** | "
          f"**{total_s / max(total_d, 1e-9):.1f}x** |")

main()
