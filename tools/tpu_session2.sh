#!/bin/bash
# Round-4 TPU session 2: step-cost levers, corrected gather probes,
# fixed sep kernel, col3d tally diagnostic.
cd /root/repo
# NOTE: do NOT export PYTHONPATH here -- it would clobber the axon
# relay's sitecustomize path (/root/.axon_site) and unregister the TPU
# backend. The package must be pip-installed editable instead
# (pip install -e . --no-build-isolation --no-deps).
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session2.log}
: > $LOG
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 90 python -u -c "import jax,jax.numpy as jnp; print('probe', float(jnp.arange(8.).sum()))" >> $LOG 2>&1
}

say "0 health"
probe || { echo WEDGED | tee -a $LOG; exit 1; }

say "1 step-cost lever experiments (the 1e8 numbers)"
timeout 1500 python -u tools/exp_step_cost.py >> $LOG 2>&1
probe || { echo WEDGED-after-1 | tee -a $LOG; exit 1; }

say "2 gather probes (wide LAST - crash risk)"
for p in onehot lane sub row8; do
  timeout 420 python -u tools/probe_gather.py $p >> $LOG 2>&1
  probe || { echo WEDGED-after-2-$p | tee -a $LOG; exit 1; }
done
timeout 420 python -u tools/probe_gather.py wide >> $LOG 2>&1
probe || { echo WEDGED-after-2-wide | tee -a $LOG; exit 1; }

say "3 sep kernel SMALL compile probe (i1-select fix)"
timeout 600 python -u - >> $LOG 2>&1 <<'EOF'
import sys, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
from test_pallas_sep import make_sep_scene
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.spectral.weights import absorption_coefficient, emission_weighting
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
dom, comps, temps = make_sep_scene()
kabs = absorption_coefficient(comps, dom.grid)
w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.95, 10.0)
src = illumination.emission(w.voxel_cdf, w.frac_atms_power, dom.grid.shape)
cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=4, use_pallas="on",
                   lw_mode=True, need_volume_absorption=False)
t = run_batch(dom, Surface.lambertian(0.05), src, rng.batch_key(1, 0), cfg)
n = int(t.n_photons)
print(f"sep small: n={n} up={float(jnp.sum(t.flux_up))/n:.4f} "
      f"net={float(jnp.sum(t.flux_absorbed))/n:.4f} nbad={int(t.n_bad)}")
EOF
probe || { echo WEDGED-after-3 | tee -a $LOG; exit 1; }

say "4 col3d tally mismatch magnitude"
timeout 600 python -u - >> $LOG 2>&1 <<'EOF'
import sys, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
from test_pallas_col import make_broken_cloud
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
dom = make_broken_cloud(nx=64, ny=64, nz=32)
cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=4, use_pallas="on",
                   need_volume_absorption=True)
t = run_batch(dom, Surface.lambertian(0.2), illumination.directional(0.5, 0.0),
              rng.batch_key(0, 0), cfg)
n = int(t.n_photons)
sv = float(jnp.sum(t.volume_absorption)); sa = float(jnp.sum(t.flux_absorbed))
print(f"col3d diag: n={n} sum_vol={sv:.6f} sum_abs={sa:.6f} "
      f"absdiff={abs(sv-sa):.6f} reldiff={abs(sv-sa)/max(sa,1e-9):.2e}")
EOF

say "DONE session 2"
