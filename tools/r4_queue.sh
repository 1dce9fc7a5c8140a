#!/bin/bash
# Round-4 TPU experiment queue (VERDICT r3 items, serialized).
#
# Waits for the axon relay to recover, then runs, in priority order:
#   0. rebuild_pretext_ckpt          -> /tmp/r4q_ckpt.log    (fresh host: the
#      gitignored demo checkpoint that cv8/few-shot load must be retrained)
#   1. run_cv8 --seed 17 23          -> /tmp/r4q_cv8.log     (VERDICT #2)
#   2. run_selection_compare         -> /tmp/r4q_sel.log     (VERDICT #4)
#   3. run_few_shot 10 reps to 24    -> /tmp/r4q_fs.log      (VERDICT #6)
#   4. run_seed_grid --seed 1        -> /tmp/r4q_grid.log    (VERDICT #8)
# (bench.py is NOT queued: the round-4 live rail set is already committed at
# rc=0 — results/bench_r4_live.json — and the driver reruns it at round end.)
# Touches /tmp/r4q_<stage>.done (with rc) after each stage. All stages wait
# for the background pytest (1-core host: don't contend with its compiles).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/zns_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

log() { echo "[r4q $(date -u +%H:%M:%S)] $*" >> /tmp/r4q.log; }

log "waiting for relay"
until timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 120
done
log "relay up"

# Measured r4: the relay can silently DROP a compile RPC — the client then
# blocks forever on axon-conn-read while a parallel probe of the same relay
# works fine. A 6h outer timeout is useless against that; every stage gets a
# bounded per-try timeout + retries. Retries are cheap: compiles persist in
# the cache and train_pretext resumes from the last saved epoch.
run_stage() {  # name per_try_timeout_s tries cmd...
  local name="$1" to="$2" tries="$3" rc; shift 3
  for i in $(seq 1 "$tries"); do
    log "start $name try $i: $*"
    timeout "$to" "$@" >> "/tmp/r4q_${name}.log" 2>&1
    rc=$?
    echo "$rc" > "/tmp/r4q_${name}.done"
    log "done $name rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 30
  done
  return 1
}

# Let the background pytest suite finish first (one core).
if [ -f /tmp/pytest_r4.pid ]; then
  while kill -0 "$(cat /tmp/pytest_r4.pid)" 2>/dev/null; do sleep 60; done
fi
log "pytest clear; starting experiment stages"

run_stage ckpt 2100 3 python tools/rebuild_pretext_ckpt.py
run_stage cv8 9000 2 python tools/run_cv8.py --seed 17 23 \
  --merge-prior results/synthetic/supervised_cv8.json
run_stage sel 7200 2 python tools/run_selection_compare.py --epochs 150
run_stage fs 9000 2 python tools/run_few_shot.py --repeats 10 --sizes 1,2,3,4,6,8,12,16,24 --n-songs 40
run_stage grid 7200 2 python tools/run_seed_grid.py --seed 1
log "queue complete"
