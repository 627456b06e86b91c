#!/bin/bash
# Interleaved A/B bench — the ONLY sound way to compare two commits'
# per-query times on this host (PERF_NOTES §1/§8/§12: the machine has
# multi-minute noise phases, so same-shape runs must ALTERNATE between
# arms; cross-round bench_out diffs and mean≈min arguments are both
# documented-unsound).
#
# Usage:
#   tools/ab_bench.sh <baseline-commit> <q1[,q2,...]> [rounds=5] [sfdir=/root/testdata/sf0.1]
#
# Arm A = the CURRENT HEAD commit (pinned into its own worktree so live
# edits cannot break mid-run — that failure mode happened), arm B = the
# baseline commit. Prints per-round minimums and a final min-over-rounds
# table. Partial bench outputs land in /tmp/ab_{A,B}_<round>.json.
set -e
BASE="${1:?baseline commit required}"
QUERIES="${2:?comma-separated query list required}"
ROUNDS="${3:-5}"
SFDIR="${4:-/root/testdata/sf0.1}"

REPO=$(git -C "$(cd "$(dirname "$0")" && pwd)" rev-parse --show-toplevel)
HEADC=$(git -C "$REPO" rev-parse --short HEAD)
for arm in A B; do
  ref=$([ $arm = A ] && echo "$HEADC" || echo "$BASE")
  wt=/tmp/ab_wt_$arm
  if [ ! -d $wt ]; then git -C "$REPO" worktree add $wt "$ref" >/dev/null; fi
  git -C $wt checkout -q "$ref"
  (cd $wt && sbt -batch compile >/dev/null 2>&1)
done
echo "A=$HEADC (HEAD)  B=$BASE  queries=$QUERIES rounds=$ROUNDS sf=$SFDIR"

export SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 BENCH_RUNS=3
for i in $(seq 1 "$ROUNDS"); do
  for arm in A B; do
    # stale-reuse guard: if this arm's Bench doesn't write the partial
    # (e.g. a baseline predating the partial-file convention), the cp
    # must fail loudly instead of silently recording the OTHER arm's file
    rm -f /tmp/bench_out_partial.json
    (cd /tmp/ab_wt_$arm && sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
    cp /tmp/bench_out_partial.json /tmp/ab_${arm}_${i}.json
    echo "round $i arm $arm: $(python3 -c "
import json; q=json.load(open('/tmp/ab_${arm}_${i}.json'))['queries']
print({k: round(v,3) for k,v in q.items()})")"
  done
  if [ "$i" = 1 ]; then
    # both arms must actually run the same query set (Bench silently
    # drops SPARK_GRAFT_ONLY names it doesn't know) — fail in round 1,
    # not with a KeyError after the final round
    python3 - <<'PYEOF'
import json, sys
a = set(json.load(open("/tmp/ab_A_1.json"))["queries"])
b = set(json.load(open("/tmp/ab_B_1.json"))["queries"])
if a != b:
    sys.exit(f"arms ran different query sets: only-A={a-b} only-B={b-a}")
PYEOF
  fi
done

python3 - "$ROUNDS" <<'EOF'
import json, sys
rounds = int(sys.argv[1])
arms = {}
for arm in "AB":
    per = {}
    for i in range(1, rounds + 1):
        for k, v in json.load(open(f"/tmp/ab_{arm}_{i}.json"))["queries"].items():
            per.setdefault(k, []).append(v)
    arms[arm] = per
print(f"\n{'query':<28} {'A(min)':>8} {'B(min)':>8} {'A/B':>6}")
for k in sorted(arms["A"]):
    a, b = min(arms["A"][k]), min(arms["B"][k])
    print(f"{k:<28} {a:>8.3f} {b:>8.3f} {a/b:>6.2f}")
EOF
