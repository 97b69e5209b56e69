"""Radiance-march cost decomposition on hardware (round-4 task #4).

The 64-direction radiance rate is ~8.2k photons/s vs the >=150k target
(VERDICT round 3, item 4). This harness times the in-kernel local
estimator with parts disabled / knobs varied to locate the cost before
restructuring (reference cost shape: one DDA march per event per
direction, Integrators/monteCarloRadiativeTransfer.f95:1623-1832).

Usage (TPU host): python tools/exp_radiance.py [--dirs N] [--quick]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import time

import jax.numpy as jnp


def build(n_dirs):
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.transport.local_estimate import (
        IntensityConfig, make_intensity_directions)

    domain = make_step_cloud(ssa=0.99, macro_factor=8,
                             compute_intensity_tables=True,
                             hybrid_width_deg=10.0)
    mus = ([1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4]
           * (max(1, n_dirs // 8)))[:n_dirs]
    phis = [(i * 67.5) % 360.0 for i in range(n_dirs)]
    dirs = make_intensity_directions(mus, phis)
    icfg = IntensityConfig(n_dirs=n_dirs, use_russian_roulette=True,
                           use_hybrid_phase=True, pallas_min_mu=0.4)
    return domain, icfg, dirs


def run_variant(domain, icfg, dirs, name, n_photons, reps=2, **over):
    """Mirror run_batch_pallas_tallies' pcfg wiring, then override."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport import pallas_kernel as pk

    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)
    pcfg, ppl = pk.config_for(1 << 16, 2, 100_000, False)
    plan = pk.plan_march(domain.grid, icfg, dirs)
    m_list, k_list, k_max, groups, perm = plan
    pcfg = dataclasses.replace(
        pcfg, n_dirs=icfg.n_dirs, block_rows=min(pcfg.block_rows, 16),
        flux_abs_2d=True,
        k_dda=k_max, k_dda_dirs=k_list, march_mode=m_list[0],
        march_dirs=m_list, dir_groups=groups, dir_perm=perm,
        intensity_rr=True, march_while=True, zeta_min=icfg.zeta_min,
        intensity_phase="hybrid", **{})
    pcfg = dataclasses.replace(pcfg, **over)

    def once(b, n_ph):
        t0 = time.time()
        out = pk.run_batch_pallas(
            domain, surface, source, rng.batch_key(0, b), pcfg, ppl,
            n_photons=n_ph, use_russian_roulette=True,
            russian_roulette_weight=1.0, intensity_dirs=dirs)
        return int(out[3]), time.time() - t0  # n_started fetch syncs

    # Marginal rate (n vs 4n photons) cancels the relay's fixed
    # per-call overhead, which at radiance run sizes (<1 s of device
    # time) otherwise dominates when the relay is degraded.
    try:
        n0, _ = once(0, n_photons)            # compile + warm
        t1 = min(once(r + 1, n_photons)[1] for r in range(reps))
        n4, t4 = once(reps + 1, 4 * n_photons)
        marginal = (n4 - n0) / max(t4 - t1, 1e-9)
    except Exception as e:  # noqa: BLE001
        print(f"| {name} | ERROR {type(e).__name__}: {str(e)[:120]} |",
              flush=True)
        return None
    print(f"| {name} | {marginal:.0f} (raw {n0 / t1:.0f}) |", flush=True)
    return marginal


def main():
    n_dirs = 64
    if "--dirs" in sys.argv:
        n_dirs = int(sys.argv[sys.argv.index("--dirs") + 1])
    nph = 1 << 14 if "--quick" in sys.argv else 1 << 17
    domain, icfg, dirs = build(n_dirs)
    print(f"| variant ({n_dirs} dirs, {nph} photons) | photons/s |",
          flush=True)
    print("|---|---|", flush=True)
    run_variant(domain, icfg, dirs, "production (march_while, colct)",
                nph)
    run_variant(domain, icfg, dirs, "noint (no LE at all)", nph,
                debug_parts="all,noint")
    run_variant(domain, icfg, dirs, "noletally (march, no tally)", nph,
                debug_parts="all,noletally")
    run_variant(domain, icfg, dirs, "letallysum (no onehot/dot)", nph,
                debug_parts="all,letallysum")
    run_variant(domain, icfg, dirs, "lestatictally (static acc row)", nph,
                debug_parts="all,lestatictally")
    run_variant(domain, icfg, dirs, "oldletally (round-4 K-merged form)",
                nph, debug_parts="all,oldletally")
    run_variant(domain, icfg, dirs, "fori (no early-exit while)", nph,
                march_while=False)
    run_variant(domain, icfg, dirs, "blk=8", nph, block_rows=8)
    run_variant(domain, icfg, dirs, "all-cell march", nph,
                march_dirs=("cell",) * n_dirs, march_mode="cell",
                dir_groups=(), k_dda_dirs=())


if __name__ == "__main__":
    main()
