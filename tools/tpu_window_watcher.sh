#!/bin/bash
# Wait for the device tunnel to come back, then record ONE full default-
# workload bench (both backends) so .bench_state.json holds a healthy
# accelerator window for the end-of-round capture (the tunnel wedges
# intermittently on this host; see rpvg_tpu/backend.py).
cd "$(dirname "$0")/.." || exit 1
log() { echo "[tpu-watcher $(date +%H:%M:%S)] $*"; }
for i in $(seq 1 60); do
  timeout 150 python -c "
import jax
assert jax.default_backend() != 'cpu'
import jax.numpy as jnp
jnp.zeros(1).block_until_ready()
import os; os._exit(0)" 2>/dev/null
  if [ $? -eq 0 ]; then
    log "tunnel healthy; recording bench windows"
    timeout 1500 python bench.py --probe-budget 240
    rc=$?
    log "bench rc=$rc"
    if [ $rc -eq 0 ] && grep -q '"tpu"' .bench_state.json 2>/dev/null; then
      log "tpu window recorded; done"
      exit 0
    fi
  else
    log "tunnel down (attempt $i)"
  fi
  sleep 240
done
log "gave up"
exit 1
