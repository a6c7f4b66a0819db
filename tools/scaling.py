#!/usr/bin/env python3
"""Generate the SCALING.md measurement table: run graft.Bench at two SFs
back-to-back in ONE machine window (so drift cancels out of the ratios)
and tabulate each query's decade ratio.

Usage: python3 tools/scaling.py [small_sfdir] [big_sfdir] [floor_sec]
Prints the markdown table (queries >= floor_sec at the big SF, sorted by
big-SF median); the prose interpretation lives in SCALING.md.
"""
import json, subprocess, sys, glob, os

A = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
B = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
FLOOR = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]


def bench(sf):
    cp = "/root/repo/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    r = subprocess.run(
        ["java"] + ADD_OPENS + ["-Xmx16g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench"],
        capture_output=True, text=True, env=env)
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    d = next(json.loads(l) for l in lines if '"total_detail"' in l)
    meds = {k: v["med"] for k, v in d["queries"].items()}
    return d["value"], meds, (d["loadavg_start"], d["loadavg_end"])


def main():
    ta, qa, la = bench(A)
    tb, qb, lb = bench(B)
    print(f"Full pack totals: {A} {ta:.1f}s -> {B} {tb:.1f}s "
          f"(loadavg {la[0]:.2f}/{la[1]:.2f} then {lb[0]:.2f}/{lb[1]:.2f})")
    print()
    print(f"| query | {os.path.basename(A)} s | {os.path.basename(B)} s "
          "| ratio per 10x data |")
    print("|---|---|---|---|")
    for name in sorted(qb, key=lambda n: -qb[n]):
        if qb[name] < FLOOR:
            continue
        r = qb[name] / max(qa.get(name, 0.0), 1e-9)
        print(f"| {name} | {qa.get(name, float('nan')):.2f} "
              f"| {qb[name]:.2f} | {r:.1f}x |")


main()
