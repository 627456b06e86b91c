#!/usr/bin/env bash
# Cross-JVM persistence proof: checkpoint in one JVM, restore + verify in
# a SEPARATE JVM (fresh process, empty payload registries) — the re-
# hydration path a lead-node restart exercises. Fails on any mismatch.
set -euo pipefail
cd "$(dirname "$0")/.."
DIR=$(mktemp -d /tmp/graft_xjvm.XXXXXX)
trap 'rm -rf "$DIR"' EXIT
echo "== phase 1: write + checkpoint (JVM A) =="
sbt -batch "runMain graft.tools.CrossJvmRestore write $DIR" 2>&1 | tee "$DIR/write.log" \
  | grep "XJ_WRITE_OK" \
  || { echo "WRITE PHASE FAILED — tail of log:"; tail -30 "$DIR/write.log"; exit 1; }
echo "== phase 2: restore + verify (JVM B, fresh process) =="
sbt -batch "runMain graft.tools.CrossJvmRestore read $DIR" 2>&1 | tee "$DIR/read.log" \
  | grep "XJ_READ_OK" \
  || { echo "READ PHASE FAILED — tail of log:"; tail -30 "$DIR/read.log"; exit 1; }
echo "== phase 3: durable catalog bootstrap (write in JVM C, BOOTSTRAP CATALOG in cold JVM D) =="
BDIR=$(mktemp -d /tmp/graft_xboot.XXXXXX)
trap 'rm -rf "$DIR" "$BDIR"' EXIT
sbt -batch "runMain graft.tools.CrossJvmRestore write_boot $BDIR" 2>&1 | tee "$BDIR/write.log" \
  | grep "XB_WRITE_OK" \
  || { echo "BOOT WRITE PHASE FAILED — tail of log:"; tail -30 "$BDIR/write.log"; exit 1; }
sbt -batch "runMain graft.tools.CrossJvmRestore boot $BDIR" 2>&1 | tee "$BDIR/boot.log" \
  | grep "XB_BOOT_OK" \
  || { echo "BOOTSTRAP PHASE FAILED — tail of log:"; tail -30 "$BDIR/boot.log"; exit 1; }
echo "cross-JVM restore + bootstrap: OK"
