#!/bin/bash
# Round-4 TPU session 8: re-run session 7's measurements with
# (a) marginal-rate timing in exp_sep2/exp_radiance (session 7's quick
#     runs were fixed-overhead-bound: every flagship geometry read
#     0.1-0.2 M/s regardless of config),
# (b) the tools' repo-root path shim (exp_radiance crashed on import),
# (c) a STRICT health gate: the trivial 8-element probe passes even
#     when a 4 MB fetch takes 100+ s, so gate on a timed bulk fetch.
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session8.log}
WAIT_MAX=${WAIT_MAX:-10800}
: > $LOG
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 240 python -u -c "
import time, jax, jax.numpy as jnp
t0 = time.time(); print('tiny', float(jnp.arange(8.).sum()))
x = jnp.ones((1024, 1024), jnp.float32) * 2.0   # 4 MB
t0 = time.time(); s = float(jnp.sum(x)); dt = time.time() - t0
print(f'bulk fetch {dt:.1f}s')
import sys; sys.exit(0 if dt < 8.0 else 1)
" >> $LOG 2>&1
}

say "0 wait for HEALTHY device (bulk-fetch gate, up to ${WAIT_MAX}s)"
deadline=$(( $(date +%s) + WAIT_MAX ))
until probe; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "NEVER-HEALTHY" | tee -a $LOG; exit 1
  fi
  sleep 90
done
say "device healthy"

say "1 sep flagship geometry sweep (marginal rates)"
timeout 3600 python -u tools/exp_sep2.py --geom >> $LOG 2>&1

say "2 sep macro_factor sweep (13 and 25 divide 325)"
timeout 2700 python -u tools/exp_sep2.py --mf 13,25 >> $LOG 2>&1

say "3 radiance tally A/B (new sublane vs oldletally), 64 dirs"
timeout 3600 python -u tools/exp_radiance.py >> $LOG 2>&1

say "4 production radiance metrics"
timeout 1800 python -u bench.py --intensity >> $LOG 2>&1

say "5 flagship sep bench metric"
timeout 1800 python -u bench.py --flagship >> $LOG 2>&1

say "6 step-cloud headline regression guard"
timeout 900 python -u bench.py --step-cloud >> $LOG 2>&1

say "done"
