#!/bin/bash
# Round-4 TPU session 9: sep-kernel per-part cost decomposition.
#   (a) exp_sep3 --small: compile sanity for the new hifamp/dbl parts;
#   (b) exp_sep3 flagship: base vs hifamp vs dblamp vs dbltally marginal
#       rates -- decides whether the hi-first amp gather becomes the
#       default and whether the tally or the gather is the 7x flagship
#       bottleneck (PERF_NOTES round 4);
#   (c) the FIXED probe_gather3 sliced baseline (session 8 crash).
# Health gate: timed 4 MB bulk fetch (the 8-element probe passes even
# when bulk fetches take 100+ s).
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session9.log}
WAIT_MAX=${WAIT_MAX:-10800}
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); x = jnp.arange(8.0).sum(); print('tiny', float(x))
t0=time.time()
import numpy as np
y = jnp.asarray(np.ones((1024,1024), np.float32))
z = np.asarray(y + 1.0)
dt = time.time()-t0
print(f'bulk fetch {dt:.1f}s')
import sys; sys.exit(0 if dt < 8.0 else 1)
" >> $LOG 2>&1
}
waithealthy() {
  deadline=$(( $(date +%s) + WAIT_MAX ))
  until probe; do
    if [ "$(date +%s)" -gt "$deadline" ]; then
      echo "NEVER-HEALTHY" | tee -a $LOG; return 1
    fi
    sleep 90
  done
  return 0
}

say "0 wait for HEALTHY device (bulk-fetch gate, up to ${WAIT_MAX}s)"
waithealthy || exit 1
say "device healthy"

say "1 exp_sep3 --small compile sanity (132x132x60)"
timeout 1800 python -u tools/exp_sep3.py --small --nb 20 >> $LOG 2>&1

say "2 exp_sep3 flagship decomposition (325x325x150)"
waithealthy || exit 1
timeout 5400 python -u tools/exp_sep3.py >> $LOG 2>&1

say "3 gather probe: sliced one-hot production baseline (fixed)"
waithealthy || exit 1
timeout 900 python -u tools/probe_gather3.py sliced >> $LOG 2>&1

say "done"
