#!/bin/bash
# Round-5 TPU experiment queue (VERDICT r4 items, serialized).
#
# Runs, in priority order:
#   0. rebuild_pretext_ckpt   -> /tmp/r5q_ckpt.log  (skips via .complete
#      marker; the round-4 checkpoint on this host is marked trusted — it
#      produced the committed supervised_cv8.json. ABORTS the queue on
#      failure: every downstream stage loads this checkpoint.)
#   1. probe_train_mfu        -> /tmp/r5q_mfu.log   (VERDICT #2 — short; its
#      numbers steer the round's MFU work, so it goes first)
#   2. run_selection_compare  -> /tmp/r5q_sel.log   (VERDICT #1a)
#   3. run_few_shot 10x to 24 -> /tmp/r5q_fs.log    (VERDICT #1b)
#   4. run_seed_grid --seed 1 -> /tmp/r5q_grid.log  (VERDICT #1c)
#   5. run_fullbudget         -> /tmp/r5q_fb.log    (VERDICT #7)
# Touches /tmp/r5q_<stage>.done (with rc) after each stage.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/zns_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

log() { echo "[r5q $(date -u +%H:%M:%S)] $*" >> /tmp/r5q.log; }

log "waiting for relay"
until timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 120
done
log "relay up"

# The relay can silently DROP a compile RPC (the client blocks forever on
# axon-conn-read while a parallel probe succeeds): bounded per-try timeouts
# + retries on every stage. Retries are cheap — compiles persist in the
# cache and the incremental artifact writers keep completed work.
run_stage() {  # name per_try_timeout_s tries cmd...
  local name="$1" to="$2" tries="$3" rc; shift 3
  for i in $(seq 1 "$tries"); do
    log "start $name try $i: $*"
    timeout "$to" "$@" >> "/tmp/r5q_${name}.log" 2>&1
    rc=$?
    echo "$rc" > "/tmp/r5q_${name}.done"
    log "done $name rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 30
  done
  return 1
}

# Downstream stages load the demo pretext checkpoint — a failed rebuild must
# abort, not silently feed them an under-trained init (ADVICE r4 high #2).
run_stage ckpt 2400 2 python tools/rebuild_pretext_ckpt.py || {
  log "ckpt stage failed; aborting queue"; exit 1; }
run_stage mfu 3600 2 python tools/probe_train_mfu.py
run_stage sel 7200 2 python tools/run_selection_compare.py --epochs 150
run_stage fs 14400 2 python tools/run_few_shot.py --repeats 10 \
  --sizes 1,2,3,4,6,8,12,16,24 --n-songs 40
run_stage grid 9000 2 python tools/run_seed_grid.py --seed 1
run_stage fb 10800 2 python tools/run_fullbudget.py --epochs 300
log "queue complete"
