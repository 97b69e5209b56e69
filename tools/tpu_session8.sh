#!/bin/bash
# Round-4 TPU session 8, reordered after session 7 (which captured the
# flagship bench at 2.73 M/s then lost the relay):
#   (a) FIRST the wide-column gather probes (grp8 grouped dynamic_gather
#       vs the production sliced one-hot) -- they decide the named 7x
#       flagship lever (PERF_NOTES: sliced gather is linear in
#       ceil(nxy/16384));
#   (b) then the step-cloud headline guard + radiance metrics (session
#       7's steps 5/7 read "device unreachable");
#   (c) then the marginal-rate sweeps (exp_sep2/exp_radiance now cancel
#       the relay's fixed per-call overhead).
# Health gate: a timed 4 MB bulk fetch -- the trivial 8-element probe
# passes even when bulk fetches take 100+ s.
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

say "1 gather probe: grp8 grouped dynamic_gather (832-row table)"
timeout 900 python -u tools/probe_gather3.py grp8 >> $LOG 2>&1

say "2 gather probe: sliced one-hot production baseline"
timeout 900 python -u tools/probe_gather3.py sliced >> $LOG 2>&1

say "3 gather probe: grp8 two fields"
timeout 900 python -u tools/probe_gather3.py grp8x2 >> $LOG 2>&1

say "4 step-cloud headline regression guard"
timeout 900 python -u bench.py --step-cloud >> $LOG 2>&1

say "5 production radiance metrics (new LE tally)"
waithealthy || exit 1
timeout 1800 python -u bench.py --intensity >> $LOG 2>&1

say "6 radiance tally A/B (sublane LE tally vs oldletally), 64 dirs"
timeout 2700 python -u tools/exp_radiance.py --quick >> $LOG 2>&1

say "7 sep flagship geometry sweep (marginal rates)"
waithealthy || exit 1
timeout 3600 python -u tools/exp_sep2.py --quick --geom >> $LOG 2>&1

say "done"
