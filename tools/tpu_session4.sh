#!/bin/bash
# Round-4 TPU session 4: post-stacked-dot bench spot-checks (headline,
# radiance incl. the new 648-dir metric, flagship sep-kernel first
# compile). Probe timeout is generous: on this 1-core host a pytest run
# can starve the probe's jax import and fake a "wedge" (session 3b).
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session4.log}
WAIT_MAX=${WAIT_MAX:-7200}
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

say "0.5 per-pixel surface drive (new sa_ref arity + dyn gather)"
timeout 900 python -u tools/exp_px.py >> $LOG 2>&1
probe || { echo WEDGED-after-0.5 | tee -a $LOG; exit 1; }

say "1 step-cloud headline (regression guard vs 107.9 M/s)"
timeout 900 python -u bench.py --step-cloud >> $LOG 2>&1

say "2 intensity bench (6/64/128/648-dir radiance)"
timeout 1800 python -u bench.py --intensity >> $LOG 2>&1
probe || { echo WEDGED-after-2 | tee -a $LOG; exit 1; }

say "3 flagship LW 325x325x150 (sep kernel)"
timeout 1800 python -u bench.py --flagship >> $LOG 2>&1
probe || { echo WEDGED-after-3 | tee -a $LOG; exit 1; }

say "4 landsat + broadband"
timeout 900 python -u bench.py --landsat >> $LOG 2>&1
timeout 900 python -u bench.py --broadband >> $LOG 2>&1

say "done"
