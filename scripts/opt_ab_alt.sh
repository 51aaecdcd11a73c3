#!/bin/bash
# Interleaved fresh-JVM A/B with alternating slot order (round-12
# methodology): round i runs (edited, HEAD) in one order, round i+1 in
# the other, each state in its own JVM via opt_ab.py OPT_AB_ROUNDS=1.
# Usage: scripts/opt_ab_alt.sh <n_rounds> q1 [q2 ...]
# Requires: uncommitted working-tree edits (state B = git stash of them).
set -e
cd "$(dirname "$0")/.."
N=$1; shift
QS="$@"
run_state () {  # $1 = label
  echo "--- $1 ---"
  OPT_AB_ROUNDS=1 python scripts/opt_ab.py $QS 2>/dev/null | grep "^round\|OPT_AB_RESULT"
}
for i in $(seq 1 "$N"); do
  if [ $((i % 2)) -eq 1 ]; then
    run_state "EDITED (round $i)"
    git stash -q; trap 'git stash pop -q' EXIT
    run_state "HEAD (round $i)"
    git stash pop -q; trap - EXIT
  else
    git stash -q; trap 'git stash pop -q' EXIT
    run_state "HEAD (round $i)"
    git stash pop -q; trap - EXIT
    run_state "EDITED (round $i)"
  fi
done
