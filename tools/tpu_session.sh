#!/bin/bash
# Round-4 TPU validation session: each step a separate subprocess with
# its own timeout; health probe between steps; stops a section on wedge.
cd /root/repo
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session.log}
: > $LOG
say() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a $LOG; }
probe() {
  timeout 90 python -u -c "import jax,jax.numpy as jnp; print('probe', float(jnp.arange(8.).sum()))" >> $LOG 2>&1
}

say "0 health"
probe || { echo WEDGED | tee -a $LOG; exit 1; }

say "1 record-kernel drive (step cloud, use_pallas=on)"
timeout 420 python -u - >> $LOG 2>&1 <<'EOF'
import jax.numpy as jnp
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
dom = make_step_cloud(ssa=0.99, macro_factor=8)
sfc = Surface.lambertian(0.0)
src = illumination.directional(0.5, 0.0)
for tag, kw in (("vol", {}), ("flux2d", dict(need_volume_absorption=False))):
    cfg = KernelConfig(n_lanes=1 << 16, photons_per_lane=16,
                       use_pallas="on", **kw)
    t = run_batch(dom, sfc, src, rng.batch_key(0, 0), cfg)
    n = int(t.n_photons)
    R = float(jnp.sum(t.flux_up))/n; T = float(jnp.sum(t.flux_down))/n
    A = float(jnp.sum(t.flux_absorbed))/n
    print(f"{tag}: R={R:.4f} T={T:.4f} A={A:.4f} R+T+A={R+T+A:.5f} "
          f"nbad={int(t.n_bad)} vol_none={t.volume_absorption is None}")
EOF
probe || { echo WEDGED-after-1 | tee -a $LOG; exit 1; }

say "2 RPV surface on hardware"
timeout 420 python -u - >> $LOG 2>&1 <<'EOF'
import jax.numpy as jnp
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
dom = make_step_cloud(ssa=0.99, macro_factor=8)
src = illumination.directional(0.5, 0.3)
cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=8, use_pallas="on",
                   need_volume_absorption=False)
tR = run_batch(dom, Surface.rpv(0.25, 0.8, -0.15), src, rng.batch_key(0, 0), cfg)
tL = run_batch(dom, Surface.lambertian(0.25), src, rng.batch_key(0, 0), cfg)
rr = float(jnp.sum(tR.flux_up))/int(tR.n_photons)
rl = float(jnp.sum(tL.flux_up))/int(tL.n_photons)
print(f"RPV R={rr:.4f} vs Lambertian R={rl:.4f} (must differ)")
EOF
probe || { echo WEDGED-after-2 | tee -a $LOG; exit 1; }

say "3 sep kernel SMALL compile probe (fresh Mosaic kernel!)"
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

say "4 col kernel: 3D + LW + gas on hardware"
timeout 600 python -u - >> $LOG 2>&1 <<'EOF'
import sys, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
from test_pallas_col import make_broken_cloud, _lw_broken_cloud, _lw_source, _gas_broken_cloud
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
v = t.volume_absorption
print(f"col3d: n={n} vol_sum={float(jnp.sum(v))/n:.4f} "
      f"abscol_match={abs(float(jnp.sum(v))-float(jnp.sum(t.flux_absorbed)))<1e-2}")
dom2, temps2 = _lw_broken_cloud()
src2 = _lw_source(dom2, temps2)
cfg2 = KernelConfig(n_lanes=1 << 13, photons_per_lane=4, use_pallas="on",
                    lw_mode=True, need_volume_absorption=False)
t2 = run_batch(dom2, Surface.lambertian(0.05), src2, rng.batch_key(3, 0), cfg2)
print(f"colLW: n={int(t2.n_photons)} up={float(jnp.sum(t2.flux_up))/int(t2.n_photons):.4f}")
dom3 = _gas_broken_cloud()
t3 = run_batch(dom3, Surface.lambertian(0.2), illumination.directional(0.5, 0.0),
               rng.batch_key(0, 0),
               KernelConfig(n_lanes=1 << 13, photons_per_lane=4,
                            use_pallas="on", need_volume_absorption=False))
n3 = int(t3.n_photons)
bal = (float(jnp.sum(t3.flux_up)) + 0.8*float(jnp.sum(t3.flux_down))
       + float(jnp.sum(t3.flux_absorbed)))/n3
print(f"colgas: n={n3} balance={bal:.4f}")
EOF
probe || { echo WEDGED-after-4 | tee -a $LOG; exit 1; }

say "5 one-device TPU mesh (shard_map x pallas_call)"
timeout 420 python -u - >> $LOG 2>&1 <<'EOF'
import numpy as np, jax.numpy as jnp
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
dom = make_step_cloud(ssa=0.99, macro_factor=8)
sfc = Surface.lambertian(0.0)
src = illumination.directional(0.5, 0.0)
cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4, use_pallas="on")
mesh = make_mesh()
t = run_batch_sharded(dom, sfc, src, seed=7, global_batch=0, config=cfg, mesh=mesh)
t2 = run_batch(dom, sfc, src, rng.batch_key(7, 0), cfg)
same = bool(np.array_equal(np.asarray(t.flux_up), np.asarray(t2.flux_up)))
print(f"mesh1: n={int(t.n_photons)} bitidentical_to_serial={same}")
EOF
probe || { echo WEDGED-after-5 | tee -a $LOG; exit 1; }

say "6 radiance 64-dir timing"
timeout 900 python -u - >> $LOG 2>&1 <<'EOF'
import time, numpy as np, jax.numpy as jnp
from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.local_estimate import (IntensityConfig,
                                                   make_intensity_directions)
dom = make_step_cloud(ssa=0.99, macro_factor=8,
                      compute_intensity_tables=True, hybrid_width_deg=10.0)
mus = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4] * 8
phis = [(i * 67.5) % 360.0 for i in range(64)]
dirs = make_intensity_directions(mus, phis)
icfg = IntensityConfig(n_dirs=64, use_russian_roulette=True,
                       use_hybrid_phase=True, pallas_min_mu=0.4)
cfg = KernelConfig(n_lanes=1 << 16, photons_per_lane=2, use_pallas="on")
sfc = Surface.lambertian(0.2); src = illumination.directional(0.5, 0.0)
t = run_batch(dom, sfc, src, rng.batch_key(4, 0), cfg,
              intensity_config=icfg, intensity_dirs=dirs)
n0 = int(t.n_photons)
t0 = time.time()
t = run_batch(dom, sfc, src, rng.batch_key(4, 1), cfg,
              intensity_config=icfg, intensity_dirs=dirs)
n = int(t.n_photons)
dt = time.time() - t0
print(f"radiance64: {n/dt:.0f} photons/s nbad={int(t.n_bad)}")
EOF
probe || { echo WEDGED-after-6 | tee -a $LOG; exit 1; }

say "7 step-cost lever experiments"
timeout 1500 python -u tools/exp_step_cost.py >> $LOG 2>&1
probe || { echo WEDGED-after-7 | tee -a $LOG; exit 1; }

say "8 gather probes (taa0 LAST - crash risk)"
timeout 420 python -u tools/probe_gather.py onehot >> $LOG 2>&1
probe || { echo WEDGED-after-8a | tee -a $LOG; exit 1; }
timeout 420 python -u tools/probe_gather.py taa1 >> $LOG 2>&1
probe || { echo WEDGED-after-8b | tee -a $LOG; exit 1; }
timeout 420 python -u tools/probe_gather.py taa0 >> $LOG 2>&1
probe || { echo WEDGED-after-8c | tee -a $LOG; exit 1; }

say "DONE core validation - run bench.py next"
