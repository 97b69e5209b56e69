"""Separable-kernel (flagship 325x325x150) perf levers, measured on HW.

Levers, in the order PERF_NOTES round-4 named them:
  * the val_lo tally restructure (values ride the lo one-hot, built once,
    vs the old per-slice [512, blk, p] value operand) -- A/B by git rev;
  * launch geometry (rows x ppl x block_rows): the radiance round showed
    occupancy-first geometry is worth multiples on straggler-bound waves;
  * macro_factor: 8 leaves partial 325/8 blocks (seam clips); 13 and 25
    divide 325 exactly.

Prints one line per config: rate, lane-steps/photon (occupancy proxy),
and flux sums (restructure sanity). ONE process, sequential configs.

Usage: python tools/exp_sep2.py [--quick] [--mf 8,13,25] [--geom]
"""

from __future__ import annotations

import sys
import time


def main():
    quick = "--quick" in sys.argv
    do_geom = "--geom" in sys.argv
    mfs = [8]
    for i, a in enumerate(sys.argv):
        if a == "--mf":
            mfs = [int(x) for x in sys.argv[i + 1].split(",")]

    sys.path.insert(0, ".")
    from bench import wait_for_device
    if not wait_for_device():
        print("DEVICE UNAVAILABLE", flush=True)
        return

    import jax.numpy as jnp

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.domain.domain import build_domain
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.collection import lw_flagship_scene
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                               emission_weighting)
    from mcbrat3d_tpu.transport.pallas_kernel import PallasConfig
    from mcbrat3d_tpu.transport.pallas_sep import run_batch_pallas_sep

    t0 = time.time()
    if "--small" in sys.argv:  # TPU compile sanity before flagship size
        grid, comps, temps = lw_flagship_scene(nx=16, ny=16)
    else:
        grid, comps, temps = lw_flagship_scene()
    kabs = absorption_coefficient(comps, grid)
    print(f"scene built {time.time() - t0:.1f}s", flush=True)

    surface = Surface.lambertian(0.05)
    n_batch = 1 << (20 if quick else 22)

    domains = {}
    for mf in mfs:
        t0 = time.time()
        domains[mf] = build_domain(grid, comps, temps=temps,
                                   macro_factor=mf, n_cdf_steps=201,
                                   lambda_um=10.0,
                                   device_fields="compact")
        w = emission_weighting(grid, temps, kabs, 288.0, 0.95, 10.0)
        src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                    grid.shape)
        domains[mf] = (domains[mf], src)
        print(f"domain mf={mf} built {time.time() - t0:.1f}s", flush=True)

    def run_cfg(name, mf, rows, ppl, blk, reps=2):
        """Marginal-rate measurement: the axon relay adds a FIXED
        multi-second per-call overhead when degraded (session 7 read
        every flagship geometry as ~0.1-0.2 M/s because 1M-photon quick
        runs were overhead-bound). Time the SAME config at n and 4n
        photons and report the marginal rate 3n/(t4-t1), which cancels
        any fixed dispatch+fetch cost; raw rates stay printed so the
        overhead itself is visible."""
        domain, src = domains[mf]
        pcfg = PallasConfig(rows=rows, block_rows=blk, max_steps=200_000)

        def one(n_ph, rep):
            t0 = time.time()
            fu, fd, ac, az, n_started, n_bad, n_calls = (
                run_batch_pallas_sep(
                    domain, surface, src, rng.batch_key(3, rep), pcfg,
                    ppl, n_photons=n_ph, lw_mode=True))
            n = int(n_started)   # host fetch forces completion
            dt = time.time() - t0
            meta = (float(jnp.sum(fu)) / n, float(jnp.sum(fd)) / n,
                    float(jnp.sum(ac)) / n, int(n_calls), int(n_bad))
            return n, dt, meta

        n0, _, meta = one(n_batch, 0)          # compile + warm
        t1 = min(one(n_batch, r)[1] for r in (1, 2))
        n4, t4a, _ = one(4 * n_batch, 3)
        _, t4b, _ = one(4 * n_batch, 4)
        t4 = min(t4a, t4b)
        marginal = (n4 - n0) / max(t4 - t1, 1e-9)
        su, sd, sa, ncalls, nbad = meta
        lane_steps = ncalls * pcfg.steps_per_call * rows * 128
        print(f"{name:40s} {marginal / 1e6:8.2f} M/s marginal  "
              f"(raw {n0 / t1 / 1e6:6.2f}/{n4 / t4 / 1e6:6.2f})  "
              f"lane-steps/ph {lane_steps / n0:7.1f}  "
              f"up {su:.4f} dn {sd:.4f} abs {sa:+.4f} nbad {nbad}",
              flush=True)
        return marginal

    # baseline: what run_batch's config_for + sep cap produces for
    # n_lanes=1<<16 (rows=512, blk capped 16), bench ppl=32
    for mf in mfs:
        run_cfg(f"mf={mf} rows=512 ppl=64 blk=16", mf, 512, 64, 16)

    if do_geom:
        mf = mfs[0]
        for rows, blk in ((512, 8), (256, 16), (256, 8), (128, 16),
                          (128, 8), (64, 8), (32, 8)):
            ppl = max(1, n_batch // (rows * 128))
            run_cfg(f"mf={mf} rows={rows} ppl={ppl} blk={blk}",
                    mf, rows, ppl, blk)


if __name__ == "__main__":
    main()
