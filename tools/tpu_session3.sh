#!/bin/bash
# Round-4 TPU session 3: hi-first gather A/B (exp_hif), radiance
# bisection refresh, flagship + intensity bench spot-checks.
# Waits (up to WAIT_MAX s) for relay recovery before starting.
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session3.log}
WAIT_MAX=${WAIT_MAX:-7200}
: > $LOG
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 90 python -u -c "import jax,jax.numpy as jnp; print('probe', float(jnp.arange(8.).sum()))" >> $LOG 2>&1
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

say "1 hif A/B (tabulated 9001x5 + LW alias)"
timeout 1500 python -u tools/exp_hif.py >> $LOG 2>&1
probe || { echo WEDGED-after-1 | tee -a $LOG; exit 1; }

say "2 step-cloud headline spot-check (regression guard)"
timeout 600 python -u bench.py --step-cloud >> $LOG 2>&1
probe || { echo WEDGED-after-2 | tee -a $LOG; exit 1; }

say "3 intensity bench (radiance rates)"
timeout 900 python -u bench.py --intensity >> $LOG 2>&1
probe || { echo WEDGED-after-3 | tee -a $LOG; exit 1; }

say "4 flagship LW 325x325x150 (sep kernel, hif inverse row)"
timeout 1200 python -u bench.py --flagship >> $LOG 2>&1
probe || { echo WEDGED-after-4 | tee -a $LOG; exit 1; }

say "done"
