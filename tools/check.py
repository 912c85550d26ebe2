#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then for
each query compare its parquet output against DuckDB running the oracle SQL on
the same testdata tables. Columns sorted by name; rows sorted by all columns;
floats compared exactly + with tolerance reporting.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, os, subprocess, sys

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    interesting = [
        l for l in (r.stdout + r.stderr).splitlines()
        if "[verify]" in l or "Exception" in l or "[error] (" in l]
    if interesting:
        sys.stdout.write("\n".join(interesting) + "\n")
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode)
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit(1)

import duckdb  # noqa: E402

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    p = f"{SFDIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

# --- surface-count gate (round-13 judge task 6): a query silently missing
# from the dump, or present in SparkEntry.queries but lacking an oracle,
# must FAIL the run — "N pass, 0 fail" over a shrunken surface is the one
# way this gate could lie. Verify dumps queries_manifest.json with every
# SparkEntry.queries name and whether the run was filtered; the expected
# full-surface count is pinned in tools/expected_query_count.txt and
# updated in the same commit that adds a query.
EXPECTED_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "expected_query_count.txt")
surface_errs = []
manifest_path = f"{OUT}/queries_manifest.json"
if os.path.exists(manifest_path):
    with open(manifest_path) as f:
        manifest = json.load(f)
    no_oracle = sorted(set(manifest["queries"]) - set(oracles))
    if no_oracle:
        surface_errs.append(
            f"queries with NO oracle entry (would never be graded): {no_oracle}")
    if not manifest.get("filtered", False):
        expected = int(open(EXPECTED_FILE).read().strip())
        if len(manifest["queries"]) != expected:
            surface_errs.append(
                f"query surface is {len(manifest['queries'])}, expected "
                f"{expected} (tools/expected_query_count.txt) — a query was "
                "added/removed without updating the pin, or silently dropped")
        if len(oracles) != expected:
            surface_errs.append(
                f"oracle surface is {len(oracles)}, expected {expected}")
else:
    surface_errs.append(
        "queries_manifest.json missing — graft.Verify predates the "
        "surface-count gate; re-run without --skip-verify")


def canon(cols, rows):
    """sort columns by name, then rows by stringified values"""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    rows2 = [tuple(r[i] for i in order) for r in rows]
    rows2.sort(key=lambda r: tuple(str(x) for x in r))
    return cols2, rows2


def cell_eq(a, b):
    """Exact equality only — the driver hashes values, so a last-ulp float
    difference or a Decimal-vs-float rendering difference is a FAIL."""
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, math.inf
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        d = abs(fa - fb)
        rel = d / max(abs(fa), abs(fb), 1e-300)
        return d == 0.0, rel
    # type mismatch (e.g. Decimal vs int/float) is a rendering hazard
    if type(a) is not type(b) and not (
            isinstance(a, (int, bool)) and isinstance(b, (int, bool))):
        return False, math.inf
    return a == b, (0.0 if a == b else math.inf)


def decimal_cols(rel):
    """DECIMAL output columns are banned: the driver's hasher renders decimals
    inconsistently between the Spark-parquet and DuckDB sides (trailing-zero
    scale), so any decimal column is a latent hash mismatch."""
    return [d[0] for d in rel.description if "DECIMAL" in str(d[1]).upper()]


n_pass = n_fail = 0
for name in sorted(oracles):
    qdir = f"{OUT}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        sdec = decimal_cols(spark_rel)
        srows = spark_rel.fetchall()
        duck_rel = con.execute(oracles[name])
        dcols = [d[0] for d in duck_rel.description]
        ddec = decimal_cols(duck_rel)
        drows = duck_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        n_fail += 1
        continue
    if sdec or ddec:
        print(f"FAIL {name}: DECIMAL output cols spark={sdec} duck={ddec}")
        n_fail += 1
        continue
    sc, sr = canon(scols, srows)
    dc, dr = canon(dcols, drows)
    if sc != dc:
        print(f"FAIL {name}: schema {sc} vs {dc}")
        n_fail += 1
        continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
        n_fail += 1
        continue
    bad = None
    max_rel = 0.0
    for i, (ra, rb) in enumerate(zip(sr, dr)):
        for j, (a, b) in enumerate(zip(ra, rb)):
            ok, rel = cell_eq(a, b)
            max_rel = max(max_rel, rel if rel != math.inf else 0)
            if not ok:
                bad = (i, sc[j], a, b)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        n_fail += 1
    else:
        tol = "" if max_rel == 0.0 else f" (float tol, max rel diff {max_rel:.2e})"
        print(f"PASS {name}: {len(sr)} rows{tol}")
        n_pass += 1

for e in surface_errs:
    print(f"FAIL surface: {e}")
    n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
