#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Runs graft.Verify on a given sf dir, then executes each oracle SQL in
DuckDB against the same parquet tables and compares (sorted rows,
columns sorted by name). Usage: python3 tools/check.py [sfDir] [--skip-verify]
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
# --only=a,b,c runs just those queries (passed through to graft.Verify)
ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")), None)
OUT = "/tmp/verify_out"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in (
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar")]

def run_verify():
    # wipe stale outputs: a failed query must not leave a previous run's
    # parquet in place and masquerade as a pass
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    cmd = ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Verify", SF, OUT]
    if ONLY: cmd.append(ONLY)
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    import duckdb
    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(OUT)):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d): continue
        got_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = [tuple(norm(v) for v in row) for row in
               con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()]
        got.sort(key=repr)
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = sorted(exp_rel.columns)
            exp = [tuple(norm(v) for v in row) for row in
                   con.sql(f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()]
            exp.sort(key=repr)
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if got_cols != exp_cols:
            results[name] = f"SCHEMA-MISMATCH got={got_cols} exp={exp_cols}"
        elif got == exp:
            results[name] = f"OK rows={len(got)}"
        else:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e]
            results[name] = (f"VALUE-MISMATCH rows got={len(got)} exp={len(exp)} "
                             f"ndiff={len(diffs)} first={diffs[:2] if diffs else (got[:1], exp[:1])}")
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{'PASS' if v.startswith('OK') else 'INFO' if v.startswith('NO-ORACLE') else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len([k for k in results if k in oracle])} oracle-checked pass, "
          f"{len(results)} total")

main()
