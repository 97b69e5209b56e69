"""Hardware A/B for the hi-first big-table gather (_hif_gather2).

The lo-first one-hot gather materializes a [blk, n_fields*hp, 128] f32
intermediate per big-table lookup; at the reference-default 9001x5
inverse-CDF table (hp = 352) that stack is ~8.6 MB/step re-read by three
full-height masked reduces. The hi-first form transposes the table
([256, hp] f32), puts the hi one-hot in sublanes (one MXU dot pulls both
stacked fields), and reduces only a [128, 128] lo mask -- ~20x less
traffic at equal MACs, and exact f32 (no bf16 hi/lo split).

Measures photons/s for the two big-table configs it affects --
tabulated-phase (9001x5 inverse CDF) and LW emission (Walker alias) --
with hif (production default) vs nohif (debug_parts control), and
cross-checks flux sums between the two.

Usage (TPU host): python tools/exp_hif.py [--quick]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def tabulated_domain():
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)

    nx, ny, nz = 32, 1, 32
    grid = Grid.regular(nx, ny, nz, 500.0 / 32, 500.0, 250.0 / 32)
    ext = np.empty((nx, ny, nz))
    ext[:16] = 2.0 / 250.0
    ext[16:] = 18.0 / 250.0
    pfs = []
    for i in range(5):
        g1 = 0.80 + 0.02 * i
        l = np.arange(1, 129, dtype=np.float64)
        pfs.append(PhaseFunction(coefficients=0.7 * g1**l + 0.3 * 0.3**l,
                                 description=f"mix{i}"))
    tbl = PhaseFunctionTable(pfs, key=list(range(5)))
    rs = np.random.RandomState(0)
    pfi = rs.randint(0, 5, size=ext.shape).astype(np.int32)
    comp = OpticalComponent("mie cloud", ext, np.full_like(ext, 0.99),
                            pfi, tbl)
    return build_domain(grid, [comp], n_cdf_steps=9001, macro_factor=8)


def lw_scene():
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                               emission_weighting)

    nx, ny, nz = 32, 32, 24
    rs = np.random.RandomState(0)
    grid = Grid.regular(nx, ny, nz, 0.1, 0.1, 0.05)
    tbl = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    gas_tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
    cld = rs.rand(nx, ny, nz) * 30.0 * (rs.rand(nx, ny, nz) > 0.5)
    comp_c = OpticalComponent("cloud", cld, np.full_like(cld, 0.6),
                              np.zeros(cld.shape, np.int32), tbl)
    gas = np.full((1, 1, nz), 1.0)
    comp_g = OpticalComponent("gas", gas, np.zeros_like(gas),
                              np.zeros(gas.shape, np.int32), gas_tbl)
    temps = 250.0 + 40.0 * rs.rand(nx, ny, nz)
    domain = build_domain(grid, [comp_c, comp_g], temps=temps,
                          macro_factor=8)
    kabs = absorption_coefficient([comp_c, comp_g], grid)
    w = emission_weighting(grid, temps, kabs, 290.0, 0.95, 10.0)
    source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                   grid.shape)
    return domain, source


def measure(domain, source, lw, ppl, parts, reps=3):
    import jax.numpy as jnp

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=ppl,
                          max_steps=800_000, use_pallas="on",
                          lw_mode=lw, pallas_debug_parts=parts)
    sfc = Surface.lambertian(0.05 if lw else 0.0)
    t = run_batch(domain, sfc, source, rng.batch_key(0, 0), config)
    n = int(t.n_photons)  # sync (compile + warm)
    sums = (float(jnp.sum(t.flux_up)) / n, float(jnp.sum(t.flux_down)) / n)
    rates = []
    for b in range(1, 1 + reps):
        t0 = time.time()
        t = run_batch(domain, sfc, source, rng.batch_key(0, b), config)
        n = int(t.n_photons)
        rates.append(n / (time.time() - t0))
    rates.sort()
    return rates[len(rates) // 2], sums


def main():
    quick = "--quick" in sys.argv
    reps = 2 if quick else 3
    from mcbrat3d_tpu.sources import illumination

    print("== tabulated phase 9001x5 ==", flush=True)
    dom = tabulated_domain()
    src = illumination.directional(0.5, 0.0)
    for parts in ("all", "all,nohif"):
        r, s = measure(dom, src, False, 128, parts, reps)
        print(f"tabulated {parts}: {r/1e6:.2f} M/s  R={s[0]:.4f} "
              f"T={s[1]:.4f}", flush=True)

    print("== LW emission 2-comp ==", flush=True)
    dom, src = lw_scene()
    for parts in ("all", "all,nohif"):
        r, s = measure(dom, src, True, 256, parts, reps)
        print(f"lw {parts}: {r/1e6:.2f} M/s  up={s[0]:.4f} "
              f"dn={s[1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
