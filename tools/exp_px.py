"""Hardware drive for the per-pixel Lambertian surface fast path.

Runs the record megakernel (use_pallas="on") on the step cloud with an
8-stripe checkerboard albedo and checks, on the real chip:
- the new kernel arity (sa_ref) compiles and runs;
- a uniform-VALUED grid reproduces the uniform-scalar run bit-for-bit;
- energy accounting: R + T + A ~ 1 with the per-pixel absorbed fraction
  (non-RR, black pixels kill photons, bright pixels reflect);
- bright-stripe columns reflect more than dark-stripe columns.

Usage (TPU host): python tools/exp_px.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax.numpy as jnp

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    dom = make_step_cloud(ssa=0.99)
    src = illumination.directional(0.5, 0.0)
    cfg = KernelConfig(n_lanes=1 << 15, photons_per_lane=16,
                       max_steps=100_000, use_pallas="on",
                       use_russian_roulette=False)
    key = rng.batch_key(7, 0)

    # 1) uniform-valued [4,1] grid vs uniform scalar: bitwise
    grid_sfc = Surface(params=jnp.full((4, 1, 1), 0.3, jnp.float32),
                       brdf_name="Lambertian")
    tG = run_batch(dom, grid_sfc, src, key, cfg)
    tU = run_batch(dom, Surface.lambertian(0.3), src, key, cfg)
    fuG, fuU = np.asarray(tG.flux_up), np.asarray(tU.flux_up)
    print("uniform-grid vs scalar bitwise:",
          bool((fuG == fuU).all()
               and (np.asarray(tG.flux_down)
                    == np.asarray(tU.flux_down)).all()), flush=True)

    # 2) checkerboard: conservation + stripe discrimination + rate
    alb = np.where(np.arange(8) % 2 == 0, 0.05, 0.65).astype(np.float32)
    sfc = Surface(params=jnp.asarray(alb.reshape(8, 1, 1)),
                  brdf_name="Lambertian")
    t = run_batch(dom, sfc, src, key, cfg)
    n = int(t.n_photons)
    R = float(jnp.sum(t.flux_up)) / n
    T = float(jnp.sum(t.flux_down)) / n
    A = float(jnp.sum(t.flux_absorbed)) / n
    # non-RR + per-pixel albedo: photons absorbed AT the surface carry
    # (1 - albedo_px) * w -- surface absorption = T-weighted mean albedo
    # complement, so R + A + (surface-absorbed) == 1; we only check the
    # atmospheric budget brackets and stripe ordering here.
    # R+T+A > 1 is expected with a reflecting surface (T counts every
    # downward surface crossing, including re-descents of reflected
    # photons); the conserved identity is R + A + surface-absorbed = 1,
    # so the T-weighted mean surface albedo back-solves as
    # 1 - (1 - R - A)/T ~ the 0.35 grid mean.
    rho_eff = 1.0 - (1.0 - R - A) / max(T, 1e-9)
    print(f"checkerboard: R={R:.4f} T={T:.4f} A={A:.4f} "
          f"T-weighted mean albedo={rho_eff:.4f} (grid mean 0.35)",
          flush=True)
    up = np.asarray(t.flux_up)[:, 0]
    stripe = np.repeat(np.arange(8) % 2 == 0, 4)
    print("bright stripes reflect more:",
          bool(up[~stripe].mean() > up[stripe].mean()), flush=True)
    t0 = time.time()
    t2 = run_batch(dom, sfc, src, rng.batch_key(7, 1), cfg)
    n2 = int(t2.n_photons)
    print(f"px-surface throughput: {n2 / (time.time() - t0) / 1e6:.1f} "
          f"M photons/s", flush=True)


if __name__ == "__main__":
    main()
