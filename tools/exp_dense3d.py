"""Round-5 experiment: the dense NON-template 3D domain floor.

VERDICT round 4 demand #5: a fast path for arbitrary dense 3D domains
past the record envelope (the BASELINE.md MODIS class), target 5 M
photons/s on 128x128x64, or a committed log of where the approach
floors. This experiment measures the three anchors of the cost model:

  (a) the XLA wave kernel on the dense 128x128x64 field (current
      general-domain state);
  (b) the record megakernel on the SAME field class at the largest
      in-envelope sizes (16384 / 36864 cells) -- the per-tile ceiling
      any xy-tiled/photon-queue design runs under BEFORE paying
      queue-exchange costs;
  (c) the same at a dyn-gather-eligible size (1024 cells).

Run: timeout 580 python tools/exp_dense3d.py      (ONE process, TPU)

MEASURED (v5e, 2026-08-20, session log in EXPERIMENTS_1e8.md "Round 5:
the dense non-template 3D floor"):
  dense 8x8x16 (1024 cells, dyn-gather)   59.9 M photons/s
  dense 32x16x32 (16384 cells, one-hot)    0.405 M photons/s
  dense 32x32x32 (32768 cells)            CRASHED the TPU worker
    ("kernel fault") and wedged the relay; gated behind --unsafe until
    root-caused. The radar config (34560 cells, 640x1) runs fine, so the
    trigger is NOT raw cell count; suspects: nxy=1024 with flux_abs_2d,
    or the 256-hi-block gather at blk=16 on this layout.
CPU step normalization (this file's scenes, XLA path):
  8x8x16 74 lane-steps/photon; 32x16x32 422; 128x128x64 246.
"""

import time

import numpy as np

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                 PhaseFunctionTable)
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch


def dense_domain(nx, ny, nz, seed=2, mf=8):
    """Correlated broken-cloud field with VERTICAL structure in every
    column (adiabatic-like ramp x horizontal amplitude + noise) -- NOT
    column-template, NOT separable (verified below)."""
    rs = np.random.RandomState(seed)
    f = rs.rand(nx, ny)
    for _ in range(3):
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    amp = (f > np.quantile(f, 0.5)) * f
    zc = (np.arange(nz) + 0.5) / nz
    prof = np.clip(1.5 * zc - 0.2, 0.0, 1.0) * (zc < 0.8)
    beta = 0.04 * amp[:, :, None] * prof[None, None, :]
    beta *= (0.5 + rs.rand(nx, ny, nz))  # per-cell noise -> full rank
    grid = Grid.regular(nx, ny, nz, 30.0, 30.0, 20.0)
    tbl = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    comp = OpticalComponent("dense cloud", beta,
                            np.full_like(beta, 0.99),
                            np.zeros(beta.shape, np.int32), tbl)
    dom = build_domain(grid, [comp], macro_factor=mf, n_cdf_steps=201)
    assert not dom.col_template, "field accidentally column-template"
    assert getattr(dom, "sep_amp", None) is None, "accidentally separable"
    return dom


def measure(dom, n_lanes, ppl, label, use_pallas, reps=2, max_steps=400_000):
    cfg = KernelConfig(n_lanes=n_lanes, photons_per_lane=ppl,
                       max_steps=max_steps, use_pallas=use_pallas,
                       need_volume_absorption=False)
    src = illumination.directional(0.5, 0.0)
    sfc = Surface.lambertian(0.2)
    t = run_batch(dom, sfc, src, rng.batch_key(0, 0), cfg)
    int(t.n_photons)  # warm/compile
    best = 0.0
    for b in range(1, 1 + reps):
        t0 = time.time()
        t = run_batch(dom, sfc, src, rng.batch_key(0, b), cfg)
        n = int(t.n_photons)
        dt = time.time() - t0
        best = max(best, n / dt)
    ns = int(t.n_steps)
    print(f"{label}: {best / 1e6:.3f} M photons/s (n={n}, "
          f"{ns * n_lanes / n:.0f} lane-steps/photon)", flush=True)
    return best


if __name__ == "__main__":
    import sys

    import jax
    print("init", jax.devices(), flush=True)
    # (a) FIRST (a later config crashes the worker): the XLA wave kernel
    # on the full MODIS-class domain -- the current general-domain state.
    measure(dense_domain(128, 128, 64), 1 << 15, 2,
            "dense 128x128x64 XLA wave kernel", "off", reps=1,
            max_steps=100_000)
    # (c)/(b): in-envelope record-kernel ceilings on the dense class
    measure(dense_domain(8, 8, 16), 1 << 16, 256,
            "dense 8x8x16 (1024 cells, dyn-gather)", "on")
    measure(dense_domain(32, 16, 32), 1 << 16, 256,
            "dense 32x16x32 (16384 cells, one-hot)", "on")
    if "--unsafe" in sys.argv:
        # KNOWN TPU-WORKER KILLER (2026-08-20): see module docstring.
        measure(dense_domain(32, 32, 32, mf=8), 1 << 16, 128,
                "dense 32x32x32 (32768 cells, near envelope max)", "on")
