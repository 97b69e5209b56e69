#!/bin/bash
# Round-4 TPU session 7: validate + measure the two tally restructures
# (sep-kernel val_lo orientation; radiance sublane-oriented LE tally)
# plus the sep launch-geometry / macro_factor levers.
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session7.log}
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

say "1 sep small-scene compile sanity (16x16x150)"
timeout 900 python -u tools/exp_sep2.py --small --quick >> $LOG 2>&1

say "2 sep flagship baseline + geometry sweep"
timeout 2700 python -u tools/exp_sep2.py --quick --geom >> $LOG 2>&1

say "3 sep macro_factor sweep (13 and 25 divide 325)"
timeout 2700 python -u tools/exp_sep2.py --quick --mf 13,25 >> $LOG 2>&1

say "4 radiance tally A/B (new sublane vs oldletally), 64 dirs"
timeout 2700 python -u tools/exp_radiance.py --quick >> $LOG 2>&1

say "5 production radiance metrics"
timeout 1800 python -u bench.py --intensity >> $LOG 2>&1

say "6 flagship sep bench metric"
timeout 1800 python -u bench.py --flagship >> $LOG 2>&1

say "7 step-cloud headline regression guard"
timeout 900 python -u bench.py --step-cloud >> $LOG 2>&1

say "done"
