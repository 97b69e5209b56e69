#!/bin/bash
# Round-4 TPU session 6: the two bench steps session 5 lost (headline hit
# a device-unreachable window; broadband crashed on the flux_abs_2d tally
# layout, fixed in spectral/broadband.py) plus the 1-device real-TPU
# shard_map x pallas_call mesh check (exp_mesh1).
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session6.log}
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

say "2 broadband end-to-end (post tally-layout fix)"
timeout 900 python -u bench.py --broadband >> $LOG 2>&1

say "3 1-device real-TPU mesh: shard_map x pallas_call composition"
timeout 900 python -u tools/exp_mesh1.py >> $LOG 2>&1

say "done"
