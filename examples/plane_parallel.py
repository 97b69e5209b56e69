"""Plane-parallel validation example.

Equivalent of the reference's bare-bones example driver (reference:
Drivers/planeParallel.f95:6-16): build a uniform slab in memory, run
batches, and print fluxes and radiances next to analytic expectations.

Run: python examples/plane_parallel.py [--cpu]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--ssa", type=float, default=1.0)
    ap.add_argument("--g", type=float, default=0.85)
    ap.add_argument("--mu0", type=float, default=0.5)
    ap.add_argument("--albedo", type=float, default=0.2)
    ap.add_argument("--photons", type=int, default=1 << 20)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from mcbrat3d_tpu.driver.config import SimulationConfig
    from mcbrat3d_tpu.driver.run import run_simulation
    from mcbrat3d_tpu.physics.phase_function import PhaseFunction
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.plane_parallel import make_slab
    from mcbrat3d_tpu.sources import illumination

    phase = (PhaseFunction.henyey_greenstein(args.g, 128) if args.g
             else PhaseFunction.isotropic())
    domain = make_slab(tau=args.tau, ssa=args.ssa, phase=phase,
                       nx=4, ny=4, nz=16, n_cdf_steps=2001,
                       compute_intensity_tables=True)
    cfg = SimulationConfig(
        solar_mu=args.mu0,
        num_photons_per_batch=args.photons,
        num_batches=args.batches,
        intensity_mus=[1.0, 0.7, 0.5],
        intensity_phis=[0.0, 0.0, 180.0],
        n_lanes=min(1 << 16, args.photons),
        max_steps=20000,
    )
    res = run_simulation(domain, Surface.lambertian(args.albedo),
                         illumination.directional(args.mu0, 0.0), cfg)

    up = res.mean["mean_flux_up"]
    dn = res.mean["mean_flux_down"]
    ab = res.mean["mean_flux_absorbed"]
    print(f"slab: tau={args.tau} ssa={args.ssa} g={args.g} "
          f"mu0={args.mu0} albedo={args.albedo}")
    print(f"photons: {res.total_photons}  batches: {res.n_batches}  "
          f"wall: {res.elapsed_seconds:.2f}s")
    print(f"flux up       = {up:.5f} +- {res.stderr['mean_flux_up']:.5f}")
    print(f"flux down     = {dn:.5f} +- {res.stderr['mean_flux_down']:.5f}")
    print(f"flux absorbed = {ab:.5f} +- {res.stderr['mean_flux_absorbed']:.5f}")

    direct = np.exp(-args.tau / args.mu0)
    print(f"direct-beam transmission (Beer-Lambert): {direct:.5f}")
    sfc_abs = (1 - args.albedo) * dn
    print(f"energy closure: up + atm_abs + sfc_abs = "
          f"{up + ab + sfc_abs:.5f} (expect 1.0)")

    rad = res.mean["intensity"].mean(axis=(0, 1))
    for (mu, phi), r in zip([(1.0, 0), (0.7, 0), (0.5, 180)], rad):
        print(f"radiance(mu={mu}, phi={phi:>3}) = {r:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
