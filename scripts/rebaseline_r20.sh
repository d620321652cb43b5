#!/bin/bash
# Round-20 host re-baseline (VERDICT r19 item 3): three load-gated settled
# full sweeps on the UNTOUCHED r19 tree (worktree pinned at 938d66d), all
# stamped with the current boot_epoch, declared the comparison floor for the
# r20 closing gate. A refused run (load gate, exit 3) is retried, not
# published — the count stays three published artifacts.
set -u
cd /root/repo/.bench-pristine
for run in a b c; do
  for attempt in 1 2 3; do
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/bench_r20_base_${run}.json \
    sbt "runMain graft.Bench" > /root/repo/.bench-pristine/sweep_${run}_${attempt}.log 2>&1
    rc=$?
    echo "run=$run attempt=$attempt rc=$rc $(date -u +%H:%M:%S)" >> /root/repo/.bench-pristine/sweeps.status
    if [ $rc -eq 0 ]; then break; fi
    sleep 60
  done
done
echo DONE >> /root/repo/.bench-pristine/sweeps.status
