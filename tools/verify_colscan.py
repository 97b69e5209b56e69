"""Round-4 verify: colscan radiance march + launch geometry on real TPU.

Drives the in-kernel radiance estimator on the step cloud (ny == 1) with
the march forced to "colscan", "cell", and "auto", asserts the in-kernel
path dispatched (use_pallas="on"), checks pixelwise agreement, and times
the production 6-dir / 64-dir configurations with the new auto geometry.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax.numpy as jnp
import numpy as np

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.local_estimate import (
    IntensityConfig, make_intensity_directions)

domain = make_step_cloud(ssa=0.99, macro_factor=8,
                         compute_intensity_tables=True,
                         hybrid_width_deg=10.0)
surface = Surface.lambertian(0.0)
source = illumination.directional(0.5, 0.0)
dirs = make_intensity_directions(
    [1.0, 0.8, 0.6, 0.45, 0.6, 0.8], [0.0, 30.0, 60.0, 120.0, 180.0, 240.0])


def run(march, ppl=4, n_dirs=6, d=None, key=0):
    icfg = IntensityConfig(n_dirs=n_dirs, use_russian_roulette=True,
                           use_hybrid_phase=True, pallas_min_mu=0.4,
                           pallas_march=march)
    cfg = KernelConfig(n_lanes=1 << 16, photons_per_lane=ppl,
                       max_steps=100_000, use_pallas="on")
    t = run_batch(domain, surface, source, rng.batch_key(0, key), cfg,
                  intensity_config=icfg, intensity_dirs=d if d is not None
                  else dirs)
    n = int(t.n_photons)  # sync
    return np.asarray(t.intensity), n


# --- correctness: colscan vs cell, same key, forced in-kernel ---------
i_cs, n = run("colscan")
i_cell, _ = run("cell")
scale = float(np.max(i_cell))
err = float(np.max(np.abs(i_cs - i_cell))) / scale
print(f"colscan-vs-cell same-key max rel err: {err:.2e}  (n={n})",
      flush=True)
assert err < 5e-3, err
i_auto, _ = run("auto")
err_a = float(np.max(np.abs(i_auto - i_cs))) / scale
print(f"auto picks colscan on ny==1: max diff vs colscan {err_a:.2e}",
      flush=True)

# --- flux sanity (shared kernel sections touched: bm_lo row offsets) --
cfg_f = KernelConfig(n_lanes=1 << 16, photons_per_lane=16,
                     use_pallas="on")
tf = run_batch(domain, surface, source, rng.batch_key(0, 0), cfg_f)
nf = int(tf.n_photons)
R = float(jnp.sum(tf.flux_up)) / nf
T = float(jnp.sum(tf.flux_down)) / nf
A = float(jnp.sum(tf.flux_absorbed)) / nf
print(f"flux R={R:.4f} T={T:.4f} A={A:.4f} R+T+A={R+T+A:.5f} "
      f"n_bad={int(tf.n_bad)}", flush=True)
assert abs(R + T + A - 1.0) < 5e-3 and int(tf.n_bad) == 0

# --- throughput with the new auto launch geometry ---------------------
def throughput(n_dirs, d, ppl, reps=3):
    icfg = IntensityConfig(n_dirs=n_dirs, use_russian_roulette=True,
                           use_hybrid_phase=True, pallas_min_mu=0.4)
    cfg = KernelConfig(n_lanes=1 << 16, photons_per_lane=ppl,
                       max_steps=100_000, use_pallas="on")

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(1, b), cfg,
                      intensity_config=icfg, intensity_dirs=d)
        return int(t.n_photons)

    n0 = once(0)  # compile
    best = 0.0
    for b in range(1, reps + 1):
        t0 = time.time()
        nb = once(b)
        best = max(best, nb / (time.time() - t0))
    return best


r6 = throughput(6, dirs, 8)
print(f"radiance 6-dir:  {r6:,.0f} photons/s", flush=True)

mus64 = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4] * 8
phis64 = [(i * 67.5) % 360.0 for i in range(64)]
dirs64 = make_intensity_directions(mus64, phis64)
r64 = throughput(64, dirs64, 2)
print(f"radiance 64-dir: {r64:,.0f} photons/s", flush=True)
print("VERIFY_OK", flush=True)
