"""Headline benchmarks (one chip). Prints ONE JSON line PER METRIC; the
I3RC step-cloud headline metric is printed LAST (the round driver parses
the final line into BENCH_r{N}.json; earlier lines are captured in the
tail so every metric is driver-verified).

Baseline target (BASELINE.md): 1e8 photons/sec/chip on the step cloud.

Timing uses host value fetches -- block_until_ready is unreliable through
the remote-TPU relay (see .claude/skills/verify/SKILL.md).

Selective runs: --intensity | --landsat | --lw | --flagship | --multi | --dense3d |
--tabulated | --radar | --step-cloud run just that metric; no flag runs
the full sweep (each metric in its own subprocess + timeout).
"""

import json
import os
import subprocess
import sys
import time

BASELINE_PHOTONS_PER_SEC = 1e8
PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_partial.json")


def _append_partial(line: str):
    """Every metric line is also appended to BENCH_partial.json on disk the
    moment it exists, so a driver timeout can never erase the round's
    numbers (round 3 lost its entire sweep to rc=124 with an empty tail)."""
    try:
        with open(PARTIAL_PATH, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def wait_for_device(max_wait_s: float = 240.0, probe_timeout: float = 75.0,
                    n_probes: int = 0):
    """The remote-TPU relay in this environment wedges for tens of minutes
    at a time (every in-process jax op blocks unkillably). Probe with a
    trivial op in a subprocess and wait for recovery before importing jax
    in-process, so the benchmark cannot hang forever.

    With n_probes > 0 the budget is PROBE-COUNT based (each probe bounded
    by probe_timeout, no sleeps between) -- the exact-budget form the
    sweep's fast-fail accounting needs; max_wait_s is ignored. A healthy
    probe through this relay measures ~90 s (per-process backend init),
    so probe timeouts below ~120 s misclassify a degraded-healthy device
    (round-4 session 10b; re-measured round 5: 89.7 s)."""
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.arange(8.0).sum()))")

    def one(timeout):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=timeout)
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    if n_probes > 0:
        for _ in range(n_probes):
            if one(probe_timeout):
                return True
        return False
    deadline = time.time() + max_wait_s
    while True:
        if one(probe_timeout):
            return True
        if time.time() > deadline:
            return False
        time.sleep(30.0)


def emit(metric, rate, **extra):
    obj = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "photons/sec/chip",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 4),
        **extra,
    }
    # Retry runs append to BENCH_partial.json a second time; tag their
    # lines so a consumer can take the LAST occurrence per metric and
    # know it was the retry (advisor round 4).
    if os.environ.get("BENCH_RETRY"):
        obj["retry"] = int(os.environ["BENCH_RETRY"])
    line = json.dumps(obj)
    print(line, flush=True)
    _append_partial(line)


def measure(run_once, n_batches=3):
    """Median per-batch photon rate; run_once(b) -> photon count."""
    run_once(0)  # warm up / compile
    rates = []
    for b in range(1, 1 + n_batches):
        t0 = time.time()
        n = run_once(b)
        rates.append(n / (time.time() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def bench_step_cloud():
    """The headline: I3RC case-1 step cloud, single component, flux
    megakernel, at the REFERENCE-DEFAULT output set -- boundary fluxes +
    absorbed flux, volume-absorption field off
    (reportVolumeAbsorption defaults .false.,
    reference: Drivers/monteCarloDriver.f95:84;
    scene: Domain-Files/i3rcStepCloud.f95:26-39). macro_factor=16 and
    photons_per_lane=1024 are tuning knobs (two-level-majorant block
    size / batch amortization), not physics -- see EXPERIMENTS_1e8.md."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    domain = make_step_cloud(ssa=0.99, macro_factor=16)
    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=1024,
                          max_steps=1_600_000, use_pallas="on",
                          need_volume_absorption=False)

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config)
        # dispatch assert: the flux-only layout really ran
        assert t.volume_absorption is None
        return int(t.n_photons)

    emit("step_cloud_photon_throughput", measure(once, 5))

    # full 3D volume-absorption tally variant (reportVolumeAbsorption on)
    config2 = KernelConfig(n_lanes=1 << 16, photons_per_lane=1024,
                           max_steps=1_600_000, use_pallas="on",
                           need_volume_absorption=True)

    def once2(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b),
                      config2)
        assert t.volume_absorption is not None
        return int(t.n_photons)

    emit("step_cloud_vol_tally_throughput", measure(once2, 3))


def bench_multi_component():
    """Gas + cloud + Rayleigh step cloud: the production broadband-SW
    component shape on the multi-component megakernel path
    (reference: src/opticalProperties.f95:217-293)."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud_multi
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    domain = make_step_cloud_multi(ssa=0.99, n_components=3, macro_factor=8)
    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=256,
                          max_steps=800_000, use_pallas="on")

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("multi_component_3_step_cloud_throughput", measure(once))


def bench_lw_emission():
    """Broadband-LW-shaped run: thermal BBEmission source (Walker-alias
    in-kernel sampling + emission pre-credits) on a 2-component
    (cloud + gas) broken-cloud domain (reference:
    src/monteCarloIllumination.f95:431-522)."""
    import numpy as np

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                               emission_weighting)
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

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
    comps = [comp_c, comp_g]
    temps = 250.0 + 40.0 * rs.rand(nx, ny, nz)
    domain = build_domain(grid, comps, temps=temps, macro_factor=8)
    kabs = absorption_coefficient(comps, grid)
    w = emission_weighting(grid, temps, kabs, 290.0, 0.95, 10.0)
    source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                   grid.shape)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=256,
                          max_steps=800_000, use_pallas="on", lw_mode=True)

    def once(b):
        t = run_batch(domain, Surface.lambertian(0.05), source,
                      rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("lw_emission_2comp_throughput", measure(once))


def bench_tabulated_phase():
    """Reference-default tabulated phase functions: 9001-step inverse-CDF
    tables with 5 entries, in-kernel angle lookup (reference:
    src/inversePhaseFunctions.f95:26-64, nPhaseIntervals default)."""
    import numpy as np

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    nx, ny, nz = 32, 1, 32
    grid = Grid.regular(nx, ny, nz, 500.0 / 32, 500.0, 250.0 / 32)
    ext = np.empty((nx, ny, nz))
    ext[:16] = 2.0 / 250.0
    ext[16:] = 18.0 / 250.0
    # 5 Mie-like entries: Legendre mixtures (NOT pure HG -> tabulated path)
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
    # mf=16 + ppl=1024: the headline's tuning knobs apply here too
    # (EXPERIMENTS_1e8.md round 5: 27.6 vs 19.7 M/s with the round-4
    # launch geometry)
    domain = build_domain(grid, [comp], n_cdf_steps=9001, macro_factor=16)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=1024,
                          max_steps=1_600_000, use_pallas="on")

    def once(b):
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("tabulated_phase_9001x5_throughput", measure(once))


def bench_radar():
    """I3RC case-3 radar-cloud scale: 640 x 1 x 54 = 34560 cells with full
    per-cell records and the 3D volume tally
    (reference: Domain-Files/i3rcRadarCloud.f95:28-30)."""
    import numpy as np

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
    from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                     PhaseFunctionTable)
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    nx, ny, nz = 640, 1, 54
    rs = np.random.RandomState(2)
    grid = Grid.regular(nx, ny, nz, 0.055, 35.0, 0.045)
    ext = (rs.rand(nx, ny, nz) * 20.0
           * (rs.rand(nx, ny, nz) > 0.4)).astype(np.float64)
    tbl = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    comp = OpticalComponent("radar cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), tbl)
    domain = build_domain(grid, [comp], macro_factor=8, n_cdf_steps=201)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=64,
                          max_steps=800_000, use_pallas="on")

    def once(b):
        t = run_batch(domain, Surface.lambertian(0.1), source,
                      rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("radar_scale_photon_throughput", measure(once))


def bench_dense3d():
    """Dense NON-template 3D domain at MODIS scale: 128x128x64 full-rank
    per-cell extinction (neither column-template nor separable), the
    BASELINE.md general-domain class the reference's replicated-domain
    model covers (reference: src/opticalProperties.f95:77-115). Runs the
    tiled dense-domain megakernel (transport/pallas_tile.py: sorted
    per-tile cohorts + per-tile HBM slab DMA); the round-5 XLA-wave
    anchor on this scene was 0.069 M photons/s."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.domain.domain import build_domain
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.collection import dense_cloud_scene
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    grid, comps, _ = dense_cloud_scene(128, 128, 64, ssa=0.99)
    domain = build_domain(grid, comps, macro_factor=0, n_cdf_steps=201)
    surface = Surface.lambertian(0.2)
    source = illumination.directional(0.5, 0.0)
    # n_lanes is the tiled kernel's photon POOL; the pass cost is linear
    # in pool size, so throughput is set by quota/pool (steady-state
    # injection) not pool width -- this is the measured-best proven
    # launch shape (pool 2^18, 32^3 tiles, 160 grid blocks: 1.21 M
    # photons/s). use_pallas='on' asserts a megakernel ran (the
    # record/col/sep kernels cannot take this domain, so it is the tile
    # path or an eligibility error).
    config = KernelConfig(n_lanes=1 << 18, photons_per_lane=8,
                          max_steps=1_000_000, use_pallas="on",
                          need_volume_absorption=False)

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b),
                      config)
        assert t.volume_absorption is None
        return int(t.n_photons)

    emit("dense3d_128x128x64_throughput", measure(once, 3))


def bench_intensity():
    """Radiance-path throughput (in-kernel local estimation, 6 upward
    directions, production-default Iwabuchi-RR + hybrid-phase estimator):
    the reference's dominant production cost (SURVEY.md section 3C)."""
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
        [1.0, 0.8, 0.6, 0.4, 0.6, 0.8],
        [0.0, 0.0, 0.0, 0.0, 180.0, 180.0])
    # PRODUCTION-DEFAULT estimator config (Iwabuchi RR + hybrid phase) --
    # megakernel-eligible since round 3, so the in-kernel DDA march per
    # direction runs with one-hot gathers instead of the XLA path's
    # 400-us-per-crossing gathers. All bench dirs have mu >= 0.4, which
    # sizes the static march bound.
    icfg = IntensityConfig(n_dirs=6, use_russian_roulette=True,
                           use_hybrid_phase=True, pallas_min_mu=0.4)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=4,
                          max_steps=100_000)

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config,
                      intensity_config=icfg, intensity_dirs=dirs)
        return int(t.n_photons)

    emit("step_cloud_radiance_throughput_6dir", measure(once))

    # 64-direction radiance grid (the reference's production radiance
    # grids reach 648 directions, Drivers/monteCarloDriver.f95:61):
    # 8 azimuths x 8 zeniths, grouped in-kernel marches + dyn cell-march
    mus64 = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4] * 8
    phis64 = [(i * 67.5) % 360.0 for i in range(64)]
    dirs64 = make_intensity_directions(mus64, phis64)
    icfg64 = IntensityConfig(n_dirs=64, use_russian_roulette=True,
                             use_hybrid_phase=True, pallas_min_mu=0.4)
    config64 = KernelConfig(n_lanes=1 << 16, photons_per_lane=2,
                            max_steps=100_000)

    def once64(b):
        t = run_batch(domain, surface, source, rng.batch_key(1, b),
                      config64, intensity_config=icfg64,
                      intensity_dirs=dirs64)
        return int(t.n_photons)

    emit("step_cloud_radiance_throughput_64dir", measure(once64, 2))

    # 128-direction grid via direction-chunked transport passes (the
    # reference's grids reach 648 dirs, Drivers/monteCarloDriver.f95:61;
    # chunks of MAX_KERNEL_DIRS re-trace the same photons). The first
    # chunk IS dirs64, so its compiled launch is reused; only the
    # second chunk compiles fresh.
    import jax.numpy as jnp
    phis128 = phis64 + [(p + 30.0) % 360.0 for p in phis64]
    dirs128 = jnp.concatenate(
        [dirs64, make_intensity_directions(mus64, phis128[64:])], axis=1)
    icfg128 = IntensityConfig(n_dirs=128, use_russian_roulette=True,
                              use_hybrid_phase=True, pallas_min_mu=0.4)

    def once128(b):
        t = run_batch(domain, surface, source, rng.batch_key(1, b),
                      config64, intensity_config=icfg128,
                      intensity_dirs=dirs128)
        assert t.intensity.shape[-1] == 128
        # each chunk is its own XLA program: syncing n_photons (chunk
        # 0's output) would NOT await the later chunks -- force the
        # concatenated image
        float(jnp.sum(t.intensity))
        return int(t.n_photons)

    emit("step_cloud_radiance_throughput_128dir_chunked",
         measure(once128, 2))

    # 648-direction grid: the REFERENCE'S PRODUCTION MAXIMUM
    # (numberOfDirections hard cap, Drivers/monteCarloDriver.f95:61).
    # 8 zeniths x 81 azimuths ordered so every full 64-dir chunk holds
    # the same 8-mu pattern (identical march statics -> the 10 full
    # chunks share ONE compiled launch; only the 8-dir tail chunk
    # compiles separately).
    mus648 = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4] * 81
    phis648 = [(i * 360.0 / 81.0) % 360.0 for i in range(81)
               for _ in range(8)]
    dirs648 = make_intensity_directions(mus648, phis648)
    icfg648 = IntensityConfig(n_dirs=648, use_russian_roulette=True,
                              use_hybrid_phase=True, pallas_min_mu=0.4)
    config648 = KernelConfig(n_lanes=1 << 14, photons_per_lane=4,
                             max_steps=100_000)

    def once648(b):
        t = run_batch(domain, surface, source, rng.batch_key(2, b),
                      config648, intensity_config=icfg648,
                      intensity_dirs=dirs648)
        assert t.intensity.shape[-1] == 648
        float(jnp.sum(t.intensity))  # await every chunk's program
        return int(t.n_photons)

    emit("step_cloud_radiance_throughput_648dir_chunked",
         measure(once648, 2))


def bench_lw_flagship():
    """The reference's broadband-LW flagship shape: 325 x 325 x 150
    (run/I3RC_bench_LW.deck ran it at 2,000 ranks in <= 1 h). 15.8M cells
    exceed every per-cell VMEM envelope; the domain is SEPARABLE
    (beta = a[col]*p[z] + q[z]), so this runs the separable-template
    megakernel (transport/pallas_sep.py) with in-kernel factorized
    BBEmission sampling -- use_pallas='on' asserts the fast path."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.domain.domain import build_domain
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.collection import lw_flagship_scene
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                               emission_weighting)
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    grid, comps, temps = lw_flagship_scene()
    # compact build (the production deck's path via SeparableBinPlan):
    # skips the 15.8M-cell per-cell device arrays + ~1 GB relay upload
    # the separable kernel never reads
    domain = build_domain(grid, comps, temps=temps, macro_factor=8,
                          n_cdf_steps=201, lambda_um=10.0,
                          device_fields="compact")
    kabs = absorption_coefficient(comps, grid)
    w = emission_weighting(grid, temps, kabs, 288.0, 0.95, 10.0)
    source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                   grid.shape)
    # ppl=256 (16.8M photons/measure) amortizes the relay's fixed
    # per-call dispatch+fetch: at ppl=32 the metric reads the overhead,
    # not the kernel (marginal kernel rate ~15 M/s, session 9c)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=256,
                          max_steps=1_600_000, lw_mode=True,
                          use_pallas="on",
                          need_volume_absorption=False)

    def once(b):
        t = run_batch(domain, Surface.lambertian(0.05), source,
                      rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("lw_flagship_325x325x150_throughput", measure(once, 2))


def bench_landsat():
    """Landsat-scale throughput: 128x128x64 broken-cloud column-template
    scene through the column megakernel (the reference's I3RC case-4
    scale; reference: Domain-Files/i3rcLandsatCloud.f95:27-40)."""
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
    domain = build_domain(grid, [comp], macro_factor=8, n_cdf_steps=201,
                          compute_intensity_tables=True,
                          hybrid_width_deg=10.0)
    config = KernelConfig(n_lanes=1 << 16, photons_per_lane=16,
                          max_steps=400_000,
                          need_volume_absorption=False)
    source = illumination.directional(0.5, 0.0)
    surface = Surface.lambertian(0.2)

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b), config)
        return int(t.n_photons)

    emit("landsat_scale_photon_throughput", measure(once))

    # Landsat-scale RADIANCE: 16 viewing directions through the column
    # kernel's in-kernel slab-scan local estimation (round-5 feature; the
    # XLA estimator measured < 1 k photons/s here in round 2). The
    # reference's I3RC case-4 radiance configuration
    # (reference: Drivers/monteCarloDriver.f95:61,
    # Domain-Files/i3rcLandsatCloud.f95:27-40).
    from mcbrat3d_tpu.transport.local_estimate import (
        IntensityConfig, make_intensity_directions)
    mus16 = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4] * 2
    phis16 = [(i * 45.0 + 15.0) % 360.0 for i in range(16)]
    dirs16 = make_intensity_directions(mus16, phis16)
    icfg16 = IntensityConfig(n_dirs=16, use_russian_roulette=True,
                             use_hybrid_phase=True, pallas_min_mu=0.4)
    config_i = KernelConfig(n_lanes=1 << 13, photons_per_lane=256,
                            max_steps=400_000, use_pallas="on",
                            need_volume_absorption=False)

    def once_i(b):
        t = run_batch(domain, surface, source, rng.batch_key(5, b),
                      config_i, intensity_config=icfg16,
                      intensity_dirs=dirs16)
        assert t.intensity is not None
        import jax.numpy as jnp
        float(jnp.sum(t.intensity))
        return int(t.n_photons)

    emit("landsat_radiance_16dir_throughput", measure(once_i, 2))


def bench_broadband(n_lam=16, n_phase=9001, ppb=1 << 18, n_batches=16,
                    nxyz=32, emit_metric=True):
    """End-to-end broadband SW: 16 lambda-bins with per-bin domain rebuild
    (SSP interpolation + inverse-CDF tables at the reference-default 9001
    intervals), transport, and moment accumulation -- the reference's unit
    of work (reference: Drivers/monteCarloDriver.f95:889-1129). Rate is
    total photons / total wall-clock INCLUDING all setup."""
    import tempfile

    import numpy as np

    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.common import CommonDomain
    from mcbrat3d_tpu.domain.ssp import SSPComponent, SSPTable
    from mcbrat3d_tpu.driver.config import SimulationConfig
    from mcbrat3d_tpu.spectral import solar as solar_io
    from mcbrat3d_tpu.spectral.broadband import run_broadband

    C = 2.99792458e8
    n_reff = 5
    lambdas = np.linspace(0.4, 1.0, n_lam)
    rs = np.random.RandomState(7)
    # Mie-like entries: 128-term Legendre mixtures per (Reff, lambda)
    starts = np.zeros((n_reff, n_lam))
    lengths = np.zeros((n_reff, n_lam))
    cmat = np.zeros((n_reff * 128, n_lam))
    for li in range(n_lam):
        pos = 1
        for e in range(n_reff):
            g1 = 0.78 + 0.03 * e + 0.005 * li
            l = np.arange(1, 129, dtype=np.float64)
            cmat[pos - 1:pos + 127, li] = 0.7 * g1**l + 0.3 * 0.3**l
            starts[e, li] = pos
            lengths[e, li] = 128
            pos += 128
    comp = SSPComponent(
        name="cloud water", ext_type="volExt",
        key=np.linspace(5.0, 25.0, n_reff),
        extinction=2.0 + 0.5 * rs.rand(n_reff, n_lam),
        ssa=np.full((n_reff, n_lam), 0.99),
        legendre_start=starts, legendre_length=lengths,
        legendre_coeffs=cmat)
    tbl = SSPTable(freq_hz=C * 1e6 / lambdas,
                   surface_albedo=np.zeros(n_lam), components=[comp])

    nx, ny, nz = nxyz, nxyz, nxyz
    grid = Grid.regular(nx, ny, nz, 0.5 / nx, 0.5 / max(1, ny), 0.25 / nz)
    mass = np.zeros((1, nx, ny, nz))
    mass[0, :, :, :nz // 2] = 1.0  # step cloud: thin lower / thick upper
    mass[0, :, :, nz // 2:] = 9.0
    reff = np.full((1, nx, ny, nz), 10.0 + 8.0 * rs.rand(nx, ny, nz))
    common = CommonDomain(grid=grid, temps=np.full((nx, ny, nz), 280.0),
                          rho=np.full((nx, ny, nz), 1.2),
                          num_conc=np.full((nx, ny, nz), 2.55e25),
                          mass_conc=mass, reff=reff)

    with tempfile.TemporaryDirectory() as td:
        solar_path = os.path.join(td, "solar.nc")
        solar_io.write_solar_source(
            solar_path, lambdas.tolist(),
            (1000.0 * np.exp(-((lambdas - 0.55) / 0.3) ** 2)).tolist())
        cfg = SimulationConfig(
            solar_mu=0.5, num_lambda=n_lam, lw_flag=-1.0,
            calc_rayleigh=True,
            num_photons_per_batch=ppb, num_batches=n_batches, iseed=11,
            n_phase_intervals=n_phase, n_lanes=1 << 16, max_steps=800_000,
            solar_source_file=solar_path)
        t0 = time.time()
        res = run_broadband(cfg, common=common, ssp_tables=[tbl])
        dt = time.time() - t0
    if emit_metric:
        emit(f"broadband_sw_{n_lam}bin_end_to_end_throughput",
             res.total_photons / dt, setup_included=True)
    return res, dt


def bench_broadband_lw(n_lam=16, n_phase=2001, ppb=1 << 20, n_batches=16,
                       nx=128, ny=128, nz=150, emit_metric=True):
    """End-to-end broadband LW: per-bin SSP rebuild + Planck frequency
    distribution + thermal transport + moment accumulation, on a
    flagship-structure scene (rank-1 stratocumulus amplitude x vertical
    profile + horizontally uniform gas absorber, z-uniform lapse temps --
    the separable class of run/I3RC_bench_LW.deck:45). Rate is total
    photons / total wall-clock INCLUDING all setup. Bin 0 runs a full
    domain build; once the separable megakernel dispatch is confirmed,
    later bins rebuild with device_fields='compact' (no per-cell device
    arrays) and emission_separable sources (no per-voxel Planck CDF) --
    the setup path the reference pays per (rank, bin)
    (reference: Drivers/monteCarloDriver.f95:889-1129)."""
    import numpy as np

    from mcbrat3d_tpu.core.grid import Grid
    from mcbrat3d_tpu.domain.common import CommonDomain
    from mcbrat3d_tpu.domain.ssp import SSPComponent, SSPTable
    from mcbrat3d_tpu.driver.config import SimulationConfig
    from mcbrat3d_tpu.spectral.broadband import run_broadband

    C = 2.99792458e8
    lambdas = np.linspace(8.0, 13.0, n_lam)
    rs = np.random.RandomState(7)
    # LW Mie-class cloud entries: modest-g Legendre rows per (Reff, lambda)
    n_reff = 3
    starts = np.zeros((n_reff, n_lam))
    lengths = np.zeros((n_reff, n_lam))
    cmat = np.zeros((n_reff * 32, n_lam))
    for li in range(n_lam):
        pos = 1
        for e in range(n_reff):
            g1 = 0.80 + 0.02 * e + 0.003 * li
            l = np.arange(1, 33, dtype=np.float64)
            cmat[pos - 1:pos + 31, li] = g1 ** l
            starts[e, li] = pos
            lengths[e, li] = 32
            pos += 32
    cloud = SSPComponent(
        name="cloud water", ext_type="volExt",
        key=np.linspace(5.0, 25.0, n_reff),
        extinction=2.0 + 0.5 * rs.rand(n_reff, n_lam),
        ssa=np.full((n_reff, n_lam), 0.6),
        legendre_start=starts, legendre_length=lengths,
        legendre_coeffs=cmat)
    gas = SSPComponent(name="gas", ext_type="absXsec",
                       xsec=2e-26 * (1.0 + 0.2 * rs.rand(nz, n_lam)))
    tbl = SSPTable(freq_hz=C * 1e6 / lambdas,
                   surface_albedo=np.full(n_lam, 0.05),
                   components=[cloud, gas])

    grid = Grid.regular(nx, ny, nz, 0.1, 0.1, 0.04)
    # rank-1 cloud: correlated horizontal amplitude x LWC-like z ramp
    f = rs.rand(nx, ny)
    for _ in range(4):
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    amp = (f - f.min()) / max(f.max() - f.min(), 1e-9)
    amp = amp * (f > np.quantile(f, 0.3))
    zprof = np.zeros(nz)
    zprof[55:85] = np.linspace(0.3, 1.0, 30)
    mass = np.zeros((1, nx, ny, nz))
    mass[0] = amp[:, :, None] * zprof[None, None, :]
    # exponential gas density + lapse temps, horizontally uniform
    zc = 0.04 * (np.arange(nz) + 0.5)
    numc = 1.2e25 * np.exp(-zc / 2.0)
    temps = 288.0 - 6.5 * zc
    common = CommonDomain(
        grid=grid,
        temps=np.broadcast_to(temps, (nx, ny, nz)).copy(),
        num_conc=np.broadcast_to(numc, (nx, ny, nz)).copy(),
        mass_conc=mass,
        reff=np.full((1, nx, ny, nz), 10.0))

    cfg = SimulationConfig(
        surface_temp=288.0, num_lambda=n_lam, lw_flag=1.0,
        calc_rayleigh=False,
        num_photons_per_batch=ppb, num_batches=n_batches, iseed=11,
        n_phase_intervals=n_phase, n_lanes=1 << 16, max_steps=200_000,
        use_pallas="on", report_volume_absorption=False)
    t0 = time.time()
    res = run_broadband(cfg, common=common, ssp_tables=[tbl])
    dt = time.time() - t0
    if emit_metric:
        emit(f"broadband_lw_{n_lam}bin_end_to_end_throughput",
             res.total_photons / dt, setup_included=True)
    return res, dt


SELECTIVE = {
    "--broadband": bench_broadband,
    "--broadband-lw": bench_broadband_lw,
    "--intensity": bench_intensity,
    "--landsat": bench_landsat,
    "--lw": bench_lw_emission,
    "--flagship": bench_lw_flagship,
    "--multi": bench_multi_component,
    "--tabulated": bench_tabulated_phase,
    "--radar": bench_radar,
    "--dense3d": bench_dense3d,
    "--step-cloud": bench_step_cloud,
}


def _emit_raw(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    _append_partial(line)
    return line


def main():
    if any(flag in sys.argv for flag in SELECTIVE):
        # Selective (subprocess) mode. When the parent sweep already
        # gated on device health (BENCH_GATED=1) skip the redundant wait:
        # a healthy probe costs ~90 s of per-process backend init through
        # this relay, and paying it per metric burned ~15 min of the
        # round-4 sweep window. Standalone invocations keep a generous
        # wait (a degraded relay can stretch a healthy probe's jax init
        # past 75 s -- session 10b).
        if not os.environ.get("BENCH_GATED"):
            if not wait_for_device(max_wait_s=420.0, probe_timeout=180.0):
                _emit_raw({"metric": "device", "error": "unreachable"})
                return
        # run ALL matching flags in argv order (the sweep groups small
        # metrics into one subprocess to amortize the ~90 s jax init)
        for flag in sys.argv[1:]:
            fn = SELECTIVE.get(flag)
            if fn is not None:
                fn()
        return

    # Full sweep. Hard lessons from rounds 3 AND 4 (both rc=124; round 3
    # with an EMPTY tail, round 4 killed mid-list after ~44 min of pure
    # device-waiting): the driver enforces its own timeout, so
    # (a) print a heartbeat line immediately, before any device wait;
    # (b) append every line to BENCH_partial.json on disk as it happens;
    # (c) cap the whole sweep well under an hour -- a relay wedge costs
    #     one metric (an error line), never the sweep;
    # (d) FAST-FAIL when the relay never recovers: after 2 consecutive
    #     unreachable waits the per-metric wait collapses to one short
    #     probe, so the all-unreachable path completes in < 15 min and
    #     exits rc=0 -- a CLEAN record that the relay was down, instead
    #     of a driver timeout kill (round-4 verdict demand #1).
    t_start = time.time()
    try:  # fresh partial file per sweep
        if os.path.exists(PARTIAL_PATH):
            os.remove(PARTIAL_PATH)
    except OSError:
        pass
    _emit_raw({"metric": "bench_heartbeat", "value": 1, "unit": "alive",
               "vs_baseline": 0.0})

    here = os.path.abspath(__file__)
    # Sweep ordered by round-5 verdict priority: the headline first, then
    # the demanded metrics (tabulated-phase gather, broadband end-to-end
    # both ways, the LW flagship, radiance). The last entry groups the
    # four small-scene metrics into ONE subprocess to amortize the ~90 s
    # per-process backend init. flagship budget covers the compact domain
    # build + a fresh Mosaic compile of the separable kernel (2-5 min).
    sweep = [(["--step-cloud"], 360), (["--tabulated"], 300),
             (["--broadband"], 420), (["--broadband-lw"], 420),
             (["--flagship"], 600), (["--intensity"], 540),
             (["--landsat", "--multi", "--lw", "--radar"], 600),
             (["--dense3d"], 420)]
    headline = None
    sweep_deadline = t_start + 35 * 60.0  # global sweep budget: 35 min
    # Device-health streak: 0 = last evidence was healthy (a metric
    # subprocess that produced lines counts -- no redundant probes on the
    # healthy path). After 2 consecutive failures, STOP probing per
    # metric (fast-fail, round-4 verdict demand #1a) except at explicit
    # recovery checkpoints; the all-unreachable path then completes in
    # ~13 min (initial 60+150 s probes + 150 s at i=0 + recovery checks)
    # and exits rc=0 -- a clean record instead of a driver rc=124 kill.
    streak = [0]

    def probe_device(n_probes=1, probe_timeout=150.0):
        ok = wait_for_device(n_probes=n_probes, probe_timeout=probe_timeout)
        streak[0] = 0 if ok else streak[0] + 1
        return ok

    def run_metric(flags, budget, retry=0):
        """Run one selective-mode subprocess (one or more metric flags);
        return the headline line if it produced one (else None)."""
        found = None
        any_line = False
        env = dict(os.environ)
        env["BENCH_GATED"] = "1"  # the sweep gates device health itself
        if retry:
            env["BENCH_RETRY"] = str(retry)

        def scan(stdout):
            nonlocal found, any_line
            if isinstance(stdout, bytes):
                stdout = stdout.decode("utf-8", "replace")
            for line in (stdout or "").splitlines():
                if line.startswith("{"):
                    # the subprocess's emit() already appended the line
                    # to BENCH_partial.json -- do NOT append again here
                    print(line, flush=True)
                    any_line = True
                    # the headline is the reference-default step-cloud
                    # metric specifically (the same subprocess also
                    # emits the volume-tally variant -- taking the last
                    # line would misreport the round's headline)
                    if ('"metric": "step_cloud_photon_throughput"' in line
                            and "error" not in line):
                        found = line
        name = "+".join(f.lstrip("-") for f in flags)
        try:
            r = subprocess.run([sys.executable, here] + flags,
                               capture_output=True, timeout=budget,
                               text=True, env=env)
            scan(r.stdout)
            if r.returncode != 0:
                _emit_raw({"metric": name, "error": (r.stderr or "")[-200:]})
        except subprocess.TimeoutExpired as e:
            # salvage metric lines the child printed before wedging
            # (advisor round 4): completed metrics survive the kill
            scan(e.stdout)
            _emit_raw({"metric": name,
                       "error": f"timeout after {budget:.0f}s"})
        # a subprocess that produced real metric lines is itself proof the
        # device works; one that died line-less is evidence it does not
        streak[0] = 0 if any_line else streak[0] + 1
        return found

    # An initial relay wedge is NOT fatal: wedges have measured 30-90 min
    # but recover mid-window -- the sweep keeps going with fast-fail
    # error lines plus periodic recovery checks, so a sweep that starts
    # wedged still captures whatever the recovered tail allows.
    if not (wait_for_device(n_probes=1, probe_timeout=60.0)
            or probe_device(1, 150.0)):
        _emit_raw({"metric": "device", "error": "initial probe unreachable "
                   "(relay wedge, see PERF_NOTES.md); continuing sweep"})
    for i, (flags, budget) in enumerate(sweep):
        name = "+".join(f.lstrip("-") for f in flags)
        remaining = sweep_deadline - time.time()
        if remaining < 90.0:
            _emit_raw({"metric": name, "error": "sweep budget exhausted"})
            continue
        if streak[0] > 0:
            # device suspect: re-probe, but once the streak reaches 2,
            # only at the mid-sweep recovery checkpoint (fast-fail)
            if streak[0] >= 2 and i not in (4, 6):
                _emit_raw({"metric": name,
                           "error": "device unreachable (fast-fail)"})
                continue
            if not probe_device(1, 150.0):
                _emit_raw({"metric": name, "error": "device unreachable"})
                continue
        # recompute AFTER any probe: the subprocess budget must fit what
        # is actually left of the sweep window (advisor round 4)
        budget = min(budget, max(90.0, sweep_deadline - time.time()))
        headline = run_metric(flags, budget) or headline
        # Spread headline retries across the window (round-4 verdict
        # demand #1b): if the headline was lost to an early wedge but the
        # device answers NOW, retry it immediately rather than only at
        # the tail (where the remaining budget may be too thin).
        if headline is None and streak[0] == 0 and i in (2, 4):
            remaining = sweep_deadline - time.time()
            if remaining > 300.0:
                headline = run_metric(["--step-cloud"],
                                      min(360.0, remaining - 60.0),
                                      retry=1)
    # Tail retry: one more chance with whatever budget remains (+5 min
    # grace past the sweep deadline, still far under the driver window).
    remaining = sweep_deadline + 300.0 - time.time()
    if headline is None and remaining > 150.0 and (
            streak[0] == 0 or probe_device(1, 150.0)):
        headline = run_metric(["--step-cloud"], remaining - 10.0, retry=2)
    if headline is not None:
        # repeat the headline as the FINAL line for the driver's parser
        print(headline, flush=True)
    else:
        # Never leave the driver's parser headline-less (advisor round 4):
        # an explicit zero-value headline with an error note is a clean,
        # parseable record that the relay was down for the whole sweep.
        _emit_raw({"metric": "step_cloud_photon_throughput", "value": 0.0,
                   "unit": "photons/sec/chip", "vs_baseline": 0.0,
                   "error": "device unreachable for the entire sweep "
                            "window (relay wedge, see PERF_NOTES.md)"})
    sys.exit(0)  # the sweep itself never signals failure (rc=0 contract)


if __name__ == "__main__":
    main()
