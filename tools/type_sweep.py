#!/usr/bin/env python3
"""Oracle output-TYPE sweep (dev tool, not part of the library).

The driver's correctness hash is over TYPED values: a DuckDB HUGEINT
(int128) column hashes differently from Spark's LONG even when every
value is equal (the q_token_budget r5/r6 failure — uncast
`sum(BIGINT) OVER (...)`). tools/compare.py stringifies values, so it
can NOT catch this class locally. This tool can: it DESCRIBEs every
oracle SQL in DuckDB and diffs the result column types against the
Spark-side parquet schema written by graft.Verify.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_out"
    python3 tools/type_sweep.py /root/testdata/sf0.001 /tmp/verify_out

Flag rules (type families that hash-diverge):
  - DuckDB HUGEINT/UHUGEINT where Spark emits any int width  -> FLAG
    (fix: CAST(... AS BIGINT) in the oracle)
  - DuckDB DECIMAL where Spark emits DOUBLE (or vice versa)  -> FLAG
  - DuckDB DECIMAL(p1,s1) vs Spark decimal(p2,s2), s1 != s2  -> FLAG
    (same scale, different precision is hash-safe: values equal)
  - int32 vs int64 etc. within plain-int family               -> OK
    (both sides stringify/serialize the same small ints; the driver
    compares values after widening — q_* rows with INTEGER vs LONG
    have passed for 6 rounds)
Exit code 1 if any flag."""
import sys, os, json
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

INT_FAMILY = {"TINYINT","SMALLINT","INTEGER","BIGINT",
              "UTINYINT","USMALLINT","UINTEGER","UBIGINT"}

def duck_family(t):
    t = t.upper()
    if t in ("HUGEINT","UHUGEINT"): return ("hugeint", None)
    if t in INT_FAMILY: return ("int", None)
    if t.startswith("DECIMAL"):
        inner = t[t.index("(")+1:t.index(")")]
        p, s = [x.strip() for x in inner.split(",")]
        return ("decimal", int(s))
    if t in ("DOUBLE","FLOAT","REAL"): return ("double", None)
    if t in ("VARCHAR","TEXT","STRING"): return ("string", None)
    if t == "BOOLEAN": return ("bool", None)
    if t in ("DATE",): return ("date", None)
    if t.startswith("TIMESTAMP"): return ("timestamp", None)
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return ("nested", None)
    return (t.lower(), None)

def arrow_family(t):
    s = str(t)
    if s.startswith("int") or s.startswith("uint"): return ("int", None)
    if s.startswith("decimal"):
        # e.g. decimal128(38, 2)
        inner = s[s.index("(")+1:s.index(")")]
        p, sc = [x.strip() for x in inner.split(",")]
        return ("decimal", int(sc))
    if s in ("double","float","halffloat"): return ("double", None)
    if s in ("string","large_string","utf8"): return ("string", None)
    if s == "bool": return ("bool", None)
    if s.startswith("date"): return ("date", None)
    if s.startswith("timestamp"): return ("timestamp", None)
    if s.startswith("list") or s.startswith("struct") or s.startswith("map"):
        return ("nested", None)
    return (s, None)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    flags = 0
    checked = 0
    for name in sorted(oracles):
        rdir = os.path.join(outdir, name)
        if not os.path.isdir(rdir):
            continue  # not part of this (possibly SPARK_GRAFT_ONLY) run
        try:
            dtypes = con.execute(
                f"DESCRIBE (\n{oracles[name]}\n)").fetchall()
        except Exception as e:
            print(f"  [ORACLE-ERR] {name}: {e}")
            flags += 1
            continue
        duck = {r[0]: r[1] for r in dtypes}
        parts = [f for f in sorted(os.listdir(rdir)) if f.endswith(".parquet")]
        if not parts:
            print(f"  [NO-PARQUET] {name}: result dir exists but holds no "
                  "parquet (interrupted Verify?)")
            flags += 1
            continue
        schema = pq.read_schema(os.path.join(rdir, parts[0]))
        spark = {f.name: f.type for f in schema}
        checked += 1
        for col in sorted(duck):
            if col not in spark:
                continue  # schema mismatch is the driver's own check
            df, ds = duck_family(duck[col])
            af, asc = arrow_family(spark[col])
            bad = None
            if df == "hugeint":
                bad = f"DuckDB {duck[col]} vs Spark {spark[col]} — CAST(... AS BIGINT) the oracle column"
            elif df == "decimal" and af != "decimal":
                bad = f"DuckDB {duck[col]} vs Spark {spark[col]} — decimal/non-decimal hash divergence"
            elif af == "decimal" and df != "decimal":
                bad = f"DuckDB {duck[col]} vs Spark {spark[col]} — non-decimal/decimal hash divergence"
            elif df == "decimal" and af == "decimal" and ds != asc:
                bad = f"DuckDB {duck[col]} vs Spark {spark[col]} — decimal SCALE differs"
            elif df != af and not (df == "int" and af == "int"):
                bad = f"DuckDB {duck[col]} vs Spark {spark[col]} — family {df} vs {af}"
            if bad:
                print(f"  [TYPE-FLAG] {name}.{col}: {bad}")
                flags += 1
    print(f"type_sweep: {checked} oracles checked, {flags} flags")
    return 1 if flags else 0

if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: type_sweep.py <sf_dir> <verify_out_dir>", file=sys.stderr)
        print("  checks every oracle SQL's result types against the Spark parquet dump", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
