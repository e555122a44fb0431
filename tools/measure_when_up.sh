#!/bin/bash
# Tunnel watcher: probe the axon TPU with a tiny matmul; the moment it
# responds, run the full measurement chain (bench.py -> bench_extra.py ->
# attribution ladders), appending everything to $LOG.
#
# Stage gating replaces the old /tmp three-script chain (wiped with /tmp):
# everything runs sequentially here, single process, honoring /tmp/cpu_busy
# (touch it to pause between stages while doing CPU-heavy work elsewhere —
# this host has ONE core and concurrent load corrupts timings).
#
# Usage: nohup bash tools/measure_when_up.sh >/dev/null 2>&1 &
set -u
cd /root/repo
LOG=${LOG:-/tmp/tunnel_probe.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

log() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

wait_not_busy() {
  while [ -e /tmp/cpu_busy ]; do sleep 30; done
}

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
EOF
}

log "watcher started (pid $$)"
until probe; do
  log "probe failed; tunnel still down"
  sleep 120
done
log "TUNNEL UP — starting measurement chain"

wait_not_busy
log "stage 1: bench.py"
timeout 1800 python bench.py >> "$LOG" 2>&1
log "stage 1 rc=$?"

wait_not_busy
log "stage 2: bench_extra.py"
timeout 2400 python bench_extra.py >> "$LOG" 2>&1
log "stage 2 rc=$?"

wait_not_busy
log "stage 3: tools/bench_increments.py"
timeout 3600 python tools/bench_increments.py >> "$LOG" 2>&1
log "stage 3 rc=$?"

wait_not_busy
log "stage 4: tools/bench_uda_increments.py"
timeout 3600 python tools/bench_uda_increments.py >> "$LOG" 2>&1
log "stage 4 rc=$?"

log "ALL_DONE"
