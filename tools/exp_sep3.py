"""Sep-kernel per-part cost decomposition + hi-first amp gather A/B (HW).

PERF_NOTES round 4 named the per-event sliced column gather as the
flagship's remaining 7x (18.2 M/s at 1 slice -> 2.39 M/s at 7), but the
sectioned column TALLY has the same O(n_sl) dot structure -- before
rewriting either, measure each part's true marginal cost with IDENTICAL
physics (duplicate-dot parts 'dblamp'/'dbltally', see
transport/pallas_sep.py) and the hi-first gather candidate ('hifamp',
bitwise-equal amp, ~n_sl x less intermediate traffic at equal MACs).

Per-part cost per photon = 1/rate(dblX) - 1/rate(base); if
rate(hifamp) >> rate(base) the gather is traffic-bound and the hi-first
form should become the default.

Timing: marginal rates (n vs 4n photons, min-of-2 each) to cancel the
relay's fixed per-call overhead; session 8 showed 1M-photon runs are
overhead-bound, so the base budget here is 4M (16M for the big runs).

Usage: python tools/exp_sep3.py [--small] [--nb 22]
"""

from __future__ import annotations

import dataclasses
import sys
import time


def main():
    nb = 22
    for i, a in enumerate(sys.argv):
        if a == "--nb":
            nb = int(sys.argv[i + 1])
    n_batch = 1 << nb

    sys.path.insert(0, ".")
    from bench import wait_for_device
    # generous probe budgets: a concurrent CPU pytest run on this
    # single-core host stretches the probe subprocess's jax import
    # past the default 75 s (session 9 read DEVICE UNAVAILABLE while
    # the device was healthy)
    if not wait_for_device(max_wait_s=900.0, probe_timeout=240.0):
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
    if "--small" in sys.argv:  # compile sanity before flagship size
        grid, comps, temps = lw_flagship_scene(
            nx=132, ny=132, nz=60, cloud_base_level=20,
            cloud_top_level=35)
    else:
        grid, comps, temps = lw_flagship_scene()
    kabs = absorption_coefficient(comps, grid)
    print(f"scene built {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    domain = build_domain(grid, comps, temps=temps, macro_factor=8,
                          n_cdf_steps=201, lambda_um=10.0,
                          device_fields="compact")
    w = emission_weighting(grid, temps, kabs, 288.0, 0.95, 10.0)
    src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                grid.shape)
    surface = Surface.lambertian(0.05)
    print(f"domain built {time.time() - t0:.1f}s", flush=True)

    base_cfg = PallasConfig(rows=512, block_rows=16, max_steps=200_000)
    results = {}

    def run_cfg(name, parts):
        pcfg = dataclasses.replace(base_cfg, debug_parts=parts)

        def one(n_ph, rep):
            # photons_per_lane must cover the requested quota or
            # n_started silently caps at rows*128*ppl (the first session
            # 9b flagship read marginal 0.00: n4 == n0 == the cap)
            ppl = -(-n_ph // (base_cfg.rows * 128))
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
        if t4 - t1 < 0.2:   # both runs inside the fixed relay overhead
            print(f"{name:28s} OVERHEAD-BOUND (t1={t1:.2f}s t4={t4:.2f}s)"
                  " -- raise --nb", flush=True)
            results[name] = 0.0
            return
        marginal = (n4 - n0) / max(t4 - t1, 1e-9)
        su, sd, sa, ncalls, nbad = meta
        results[name] = marginal
        print(f"{name:28s} {marginal / 1e6:8.2f} M/s marginal  "
              f"(raw {n0 / t1 / 1e6:6.2f}/{n4 / t4 / 1e6:6.2f})  "
              f"up {su:.4f} dn {sd:.4f} abs {sa:+.4f} nbad {nbad}",
              flush=True)

    run_cfg("base (sliced amp)", "")
    run_cfg("hifamp (hi-first amp)", "hifamp")
    run_cfg("dblamp (2x sliced amp)", "dblamp")
    run_cfg("dbltally (2x col tally)", "dbltally")
    run_cfg("hifamp+dbltally", "hifamp,dbltally")

    base = results.get("base (sliced amp)", 0.0)
    if base > 0:
        for k, v in results.items():
            if k == "base (sliced amp)" or v <= 0:
                continue
            d_us = (1.0 / v - 1.0 / base) * 1e6
            print(f"  {k:28s} marginal part-cost {d_us:+8.3f} us/photon "
                  f"({v / base:.2f}x base)", flush=True)


if __name__ == "__main__":
    main()
