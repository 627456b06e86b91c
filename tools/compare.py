#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only, not part
of the library). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <name>.parquet result with DuckDB running oracle_sql.json,
sorting columns by name and hashing values (rows sorted), like the driver.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    # sort columns by name, then sort rows, then hash stringified values
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if not os.path.isdir(p):
            continue
        tbl = pq.read_table(p)
        if name not in oracles:
            print(f"  [rows-only] {name}: {tbl.num_rows} rows")
            n_skip += 1
            continue
        try:
            oracle = con.execute(oracles[name])
            orows = oracle.fetchall()
            ocols = [d[0] for d in oracle.description]
        except Exception as e:
            print(f"  [ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        if sorted(scols) != sorted(ocols):
            print(f"  [SCHEMA-MISMATCH] {name}: spark={sorted(scols)} duck={sorted(ocols)}")
            n_bad += 1
            continue
        if len(srows) != len(orows):
            print(f"  [ROWS-MISMATCH] {name}: spark={len(srows)} duck={len(orows)}")
            n_bad += 1
            continue
        h1, h2 = canon(srows, scols), canon(orows, ocols)
        if h1 == h2:
            print(f"  [OK] {name}: {len(srows)} rows")
            n_ok += 1
        else:
            print(f"  [HASH-MISMATCH] {name}")
            # show first differing row for debugging
            for a, b in zip(sorted(map(str, srows)), sorted(map(str, orows))):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
            n_bad += 1
    print(f"== ok={n_ok} bad={n_bad} rows_only={n_skip}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
