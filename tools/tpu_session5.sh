#!/bin/bash
# Round-4 TPU session 5: the bench steps session 4 lost to the relay
# wedge after the per-pixel surface drive (which itself passed).
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session5.log}
WAIT_MAX=${WAIT_MAX:-9000}
: > $LOG
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 240 python -u -c "import jax,jax.numpy as jnp; print('probe', float(jnp.arange(8.).sum()))" >> $LOG 2>&1
}

say "0 wait for device (up to ${WAIT_MAX}s)"
deadline=$(( $(date +%s) + WAIT_MAX ))
until probe; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "NEVER-RECOVERED" | tee -a $LOG; exit 1
  fi
  sleep 60
done
say "device up"

say "1 step-cloud headline (regression guard vs 107.9 M/s)"
timeout 900 python -u bench.py --step-cloud >> $LOG 2>&1

say "2 intensity bench (6/64/128/648-dir radiance)"
timeout 1800 python -u bench.py --intensity >> $LOG 2>&1

say "3 flagship LW 325x325x150 (sep kernel first hardware compile)"
timeout 1800 python -u bench.py --flagship >> $LOG 2>&1

say "4 landsat + broadband"
timeout 900 python -u bench.py --landsat >> $LOG 2>&1
timeout 900 python -u bench.py --broadband >> $LOG 2>&1

say "done"
