"""Headline benchmark: photon throughput on the I3RC step cloud (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 1e8 photons/sec/chip on the step cloud.

Timing uses host value fetches -- block_until_ready is unreliable through
the remote-TPU relay (see .claude/skills/verify/SKILL.md).
"""

import json
import subprocess
import sys
import time

BASELINE_PHOTONS_PER_SEC = 1e8


def wait_for_device(max_wait_s: float = 2400.0, probe_timeout: float = 90.0):
    """The remote-TPU relay in this environment wedges for tens of minutes
    at a time (every in-process jax op blocks unkillably). Probe with a
    trivial op in a subprocess and wait for recovery before importing jax
    in-process, so the benchmark cannot hang forever."""
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.arange(8.0).sum()))")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        time.sleep(30.0)


def bench_intensity():
    """Radiance-path throughput (local estimation, 6 directions, Iwabuchi
    RR): the reference's dominant production cost (SURVEY.md section 3C).
    Run with: python bench.py --intensity. Prints its own JSON line."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
    from mcbrat3d_tpu.transport.local_estimate import (
        IntensityConfig, make_intensity_directions)

    domain = make_step_cloud(ssa=0.99, macro_factor=8,
                             compute_intensity_tables=True)
    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)
    dirs = make_intensity_directions(
        [1.0, 0.8, 0.6, 0.4, 0.6, 0.8],
        [0.0, 0.0, 0.0, 0.0, 180.0, 180.0])
    # Exact (non-RR) estimator: megakernel-eligible, so the in-kernel
    # DDA march per direction runs with one-hot gathers instead of the
    # XLA path's 400-us-per-crossing gathers. All bench dirs have
    # mu >= 0.4, which sizes the static march bound.
    icfg = IntensityConfig(n_dirs=6, use_russian_roulette=False,
                           use_hybrid_phase=False, pallas_min_mu=0.4)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=4,
                          max_steps=100_000)
    t = run_batch(domain, surface, source, rng.batch_key(0, 0), config,
                  intensity_config=icfg, intensity_dirs=dirs)
    _ = int(t.n_photons)
    rates = []
    for b in range(1, 4):
        t0 = time.time()
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config,
                      intensity_config=icfg, intensity_dirs=dirs)
        n = int(t.n_photons)
        rates.append(n / (time.time() - t0))
    rates.sort()
    rate = rates[len(rates) // 2]
    print(json.dumps({
        "metric": "step_cloud_radiance_throughput_6dir",
        "value": round(rate, 1),
        "unit": "photons/sec/chip",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 4),
    }))


def bench_landsat():
    """Landsat-scale throughput: 128x128x64 broken-cloud column-template
    scene through the column megakernel (the reference's I3RC case-4
    scale; reference: Domain-Files/i3rcLandsatCloud.f95:27-40). Run with:
    python bench.py --landsat."""
    import numpy as np

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    nx, ny, nz = 128, 128, 64
    rs = np.random.RandomState(1)
    # spatially correlated broken-cloud field (the Landsat scene class:
    # patchy clouds with contiguous clear regions)
    f = rs.rand(nx, ny)
    for _ in range(3):
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    cloudy = f > np.quantile(f, 0.55)
    scale = rs.rand(nx, ny) * 0.05 * cloudy
    h = (np.ceil(f * nz)).astype(int) * (scale > 0)
    scale = scale * (h > 0)
    ext = np.zeros((nx, ny, nz))
    for k in range(nz):
        ext[:, :, k] = np.where(k < h, scale, 0.0)
    grid = Grid.regular(nx, ny, nz, 30.0, 30.0, 20.0)
    table = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    comp = OpticalComponent("broken cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), table)
    domain = build_domain(grid, [comp], macro_factor=8, n_cdf_steps=201)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=16,
                          max_steps=400_000,
                          need_volume_absorption=False)
    source = illumination.directional(0.5, 0.0)
    surface = Surface.lambertian(0.2)
    t = run_batch(domain, surface, source, rng.batch_key(0, 0), config)
    _ = int(t.n_photons)
    rates = []
    for b in range(1, 4):
        t0 = time.time()
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config)
        n = int(t.n_photons)
        rates.append(n / (time.time() - t0))
    rates.sort()
    rate = rates[len(rates) // 2]
    print(json.dumps({
        "metric": "landsat_scale_photon_throughput",
        "value": round(rate, 1),
        "unit": "photons/sec/chip",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 4),
    }))


def main():
    if not wait_for_device():
        print(json.dumps({
            "metric": "step_cloud_photon_throughput",
            "value": 0.0,
            "unit": "photons/sec/chip",
            "vs_baseline": 0.0,
            "note": "device unreachable: the TPU relay stayed wedged for "
                    "40 minutes; see PERF_NOTES.md 'Relay hazard'",
        }))
        return

    if "--intensity" in sys.argv:
        bench_intensity()
        return
    if "--landsat" in sys.argv:
        bench_landsat()
        return

    import jax.numpy as jnp  # noqa: F401  (device now known reachable)

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
    domain = make_step_cloud(ssa=0.99, macro_factor=8)
    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=512,
                          max_steps=800_000)

    # Warm up / compile
    t = run_batch(domain, surface, source, rng.batch_key(0, 0), config)
    _ = int(t.n_photons)

    # The remote-TPU relay occasionally stalls a dispatch for seconds;
    # report the median per-batch rate so one stall doesn't skew the
    # measurement of the kernel itself.
    n_batches = 5
    rates = []
    for b in range(1, 1 + n_batches):
        t0 = time.time()
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config)
        n = int(t.n_photons)  # host fetch forces completion
        rates.append(n / (time.time() - t0))
    rates.sort()
    rate = rates[len(rates) // 2]
    print(json.dumps({
        "metric": "step_cloud_photon_throughput",
        "value": round(rate, 1),
        "unit": "photons/sec/chip",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
