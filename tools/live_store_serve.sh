#!/usr/bin/env bash
# Two-process LIVE store proof: JVM A ingests (micro-append + roll-up +
# DML) and publishes committed epochs to a shared diskstore root while
# JVM B — a separate, CONCURRENT process — attaches read-only to each
# new epoch and serves a grouped query from its restored store table.
# Afterwards every served answer is hash-checked by DuckDB against the
# parquet that epoch published (the oracle), proving B's answers match
# at (at least) two different epochs and that B never observed a torn
# snapshot (the attach aborts on any fingerprint mismatch).
#
# Raw `java` launches (not sbt) so the two JVMs genuinely overlap — sbt
# serializes on the project lock.
set -euo pipefail
cd "$(dirname "$0")/.."
DIR=$(mktemp -d /tmp/graft_live.XXXXXX)
trap 'rm -rf "$DIR"' EXIT
sbt -batch compile >/dev/null 2>&1

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $ADD_OPENS -Xmx3g -cp $CP"

echo "== JVM A (ingest, background) + JVM B (serve, concurrent) =="
$JAVA graft.tools.LiveStoreServe ingest "$DIR/store" 6 \
  >"$DIR/ingest.log" 2>&1 &
A_PID=$!
# B starts immediately — it polls until the first committed epoch appears
if ! $JAVA graft.tools.LiveStoreServe serve "$DIR/store" "$DIR/answers" 5 \
    >"$DIR/serve.log" 2>&1; then
  echo "SERVE FAILED — tail of logs:"; tail -20 "$DIR/serve.log" "$DIR/ingest.log"
  kill "$A_PID" 2>/dev/null || true; exit 1
fi
if ! wait "$A_PID"; then
  echo "INGEST FAILED — tail of log:"; tail -20 "$DIR/ingest.log"; exit 1
fi
grep XJ_LIVE_PUBLISH "$DIR/ingest.log"
grep "XJ_LIVE_SERVE\|XJ_LIVE_READ_OK" "$DIR/serve.log"
grep -q XJ_LIVE_SERVE_ROW "$DIR/serve.log" || { echo "row arm never served"; exit 1; }
grep -q XJ_LIVE_SERVE_VIEW "$DIR/serve.log" || { echo "view arm never served"; exit 1; }

echo "== DuckDB oracle: B's answer vs the published epoch data =="
python3 - "$DIR" <<'EOF'
import duckdb, glob, os, sys
root = sys.argv[1]
answers = sorted(glob.glob(os.path.join(root, "answers", "answer_[0-9]*")))
assert len(answers) >= 2, f"need answers at >=2 epochs, got {answers}"
con = duckdb.connect()
ok = 0
for a in answers:
    epoch = os.path.basename(a).split("_")[1]
    edir = os.path.join(root, "store", f"epoch_{epoch}")
    data = os.path.join(edir, "data")
    layout = os.path.join(edir, "layout.properties")
    # the epoch may have been pruned by retention after serving; the
    # oracle can only check epochs whose files still exist
    if os.path.isdir(data):
        src = f"'{data}/*.parquet'"
    elif os.path.isfile(layout):
        # incremental epoch: rows live in the shared payload files the
        # manifest references (entry format id:mutFp:rows:hash:name)
        payloads = ""
        for line in open(layout):
            if line.startswith("payloads="):
                payloads = line[len("payloads="):].strip().replace("\\:", ":")
        names = [e.split(":")[4] for e in payloads.split(";") if e]
        globs = [os.path.join(root, "store", "payloads", n, "*.parquet")
                 for n in names if n]
        assert all(glob.glob(g) for g in globs), \
            f"epoch {epoch}: referenced payload missing: {globs}"
        src = "[" + ", ".join(f"'{g}'" for g in globs) + "]"
    else:
        print(f"  [skip] epoch {epoch}: pruned by retention")
        continue
    want = con.execute(
        "SELECT k, count(*)::BIGINT AS n, sum(v)::BIGINT AS sv, "
        "count(CASE WHEN s LIKE 'updated%' THEN 1 END)::BIGINT AS upd "
        f"FROM read_parquet({src}) GROUP BY k ORDER BY k"
    ).fetchall()
    got = con.execute(
        "SELECT k, n, sv, upd "
        f"FROM read_parquet('{a}/*.parquet') ORDER BY k").fetchall()
    assert got == want, f"epoch {epoch} MISMATCH:\n got={got}\nwant={want}"
    print(f"  [OK] epoch {epoch}: {len(got)} groups hash-match the oracle")
    ok += 1
assert ok >= 2, f"oracle verified only {ok} epochs (need >=2)"
# zero-copy arm: the attachView answers must equal the restored-copy
# answers at every epoch both were written for (same query, same epoch)
view_ok = 0
for a in sorted(glob.glob(os.path.join(root, "answers", "answer_view_*"))):
    epoch = os.path.basename(a).split("_")[2]
    copy = os.path.join(root, "answers", f"answer_{epoch}")
    if not os.path.isdir(copy):
        continue
    want = con.execute(
        f"SELECT k, n, sv, upd FROM read_parquet('{copy}/*.parquet') ORDER BY k").fetchall()
    got = con.execute(
        f"SELECT k, n, sv, upd FROM read_parquet('{a}/*.parquet') ORDER BY k").fetchall()
    assert got == want, f"view epoch {epoch} diverges from restored copy:\n{got}\n{want}"
    view_ok += 1
assert view_ok >= 2, f"view arm verified only {view_ok} epochs (need >=2)"
print(f"  [OK] zero-copy view answers match the restored copy at {view_ok} epochs")
# row-table arm (served through the session publishTable/attachTable face)
row_ok = 0
for a in sorted(glob.glob(os.path.join(root, "answers", "answer_row_*"))):
    epoch = os.path.basename(a).split("_")[2]
    data = os.path.join(root, "store-row", f"epoch_{epoch}", "data")
    if not os.path.isdir(data):
        print(f"  [skip] row epoch {epoch}: pruned by retention")
        continue
    want = con.execute(
        "SELECT count(*)::BIGINT AS n, sum(val)::BIGINT AS sv "
        f"FROM read_parquet('{data}/*.parquet')").fetchall()
    got = con.execute(f"SELECT n, sv FROM read_parquet('{a}/*.parquet')").fetchall()
    assert got == want, f"row epoch {epoch} MISMATCH: got={got} want={want}"
    print(f"  [OK] row epoch {epoch}: count+sum hash-match the oracle")
    row_ok += 1
assert row_ok >= 1, "row-table arm verified no epochs"
print(f"oracle verified {ok} column epochs + {row_ok} row epochs")
EOF
echo "two-process live store serve: OK"
