"""Broadband (multi-wavelength) simulation driver.

Re-design of the reference's broadband flow (reference:
Drivers/monteCarloDriver.f95:289-505 setup, :889-1129 worker loop):

  SW: solar spectral CDF (solar_Weighting) -> multinomial photon counts per
      wavelength bin -> per-bin transport with directional source.
  LW: per-bin emission weighting (Planck x absorption CDF per voxel) ->
      spectral flux CDF over bins -> per-bin transport with the
      atmosphere+surface emission source and LW pre-credits.

The reference's dynamic MPI master-worker assignment of (lambda-bin, count)
work units becomes a *static deterministic schedule*: the multinomial
distribution is drawn once (seeded), then bins are processed in order with
a traced per-batch photon count. Results are bit-reproducible for a fixed
(seed, device count); runs with different device counts use different RNG
stream layouts and agree statistically, not bitwise.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.accumulate import MomentAccumulator, kahan_cumsum
from mcbrat3d_tpu.domain.common import read_common
from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.domain.sep_plan import (build_domain_from_plan,
                                          make_separable_bin_plan)
from mcbrat3d_tpu.domain.ssp import components_from_ssp, read_ssp_table
from mcbrat3d_tpu.driver.config import SimulationConfig
from mcbrat3d_tpu.driver.run import Results, kernel_config_from
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.spectral import solar as solar_io
from mcbrat3d_tpu.spectral.weights import (
    absorption_coefficient,
    emission_weighting,
    frequency_distribution,
    lambda_widths,
    lw_setup_fluxes,
    solar_weighting,
)
from mcbrat3d_tpu.transport.integrator import run_batch
from mcbrat3d_tpu.transport.local_estimate import (
    IntensityConfig,
    make_intensity_directions,
)

import time


def _tallies_to_arrays(t):
    arrays = {
        "flux_up": np.asarray(t.flux_up),
        "flux_down": np.asarray(t.flux_down),
        "flux_absorbed": np.asarray(t.flux_absorbed),
    }
    # volume_absorption is None on the flux_abs_2d / column fast paths
    # (the z marginal or 2D tally replaces the full 3D field); mirror
    # driver/run.py's guarded layout so every tally shape accumulates.
    if t.volume_absorption is not None:
        arrays["volume_absorption"] = np.asarray(t.volume_absorption)
    arrays["mean_flux_up"] = arrays["flux_up"].mean()
    arrays["mean_flux_down"] = arrays["flux_down"].mean()
    arrays["mean_flux_absorbed"] = arrays["flux_absorbed"].mean()
    if getattr(t, "absorption_profile", None) is not None:
        arrays["absorption_profile"] = np.asarray(t.absorption_profile)
    elif t.volume_absorption is not None:
        arrays["absorption_profile"] = arrays[
            "volume_absorption"].mean(axis=(0, 1))
    if t.intensity is not None:
        arrays["intensity"] = np.asarray(t.intensity)
    return arrays


def _sep_path_confirmed(domain, surface, source, kcfg, icfg) -> bool:
    """True when this bin's run dispatches to the separable megakernel
    (on TPU with use_pallas='auto', or anywhere with 'on') -- the record
    and column kernels take precedence in run_batch's dispatch order, so
    they must be INELIGIBLE for the sep path to be the one that runs."""
    import jax

    from mcbrat3d_tpu.transport import pallas_col as _pc
    from mcbrat3d_tpu.transport import pallas_kernel as _pk
    from mcbrat3d_tpu.transport import pallas_sep as _psep

    if kcfg.use_pallas == "off":
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (on_tpu or kcfg.use_pallas == "on"):
        return False
    compute_intensity = icfg is not None
    common = dict(lw_mode=kcfg.lw_mode, compute_intensity=compute_intensity,
                  record_scattering_orders=kcfg.record_scattering_orders,
                  use_ray_tracing=kcfg.use_ray_tracing)
    if not _pk.ineligibility_reasons(domain, surface, source, **common):
        return False
    if _pc.pallas_col_eligible(
            domain, surface, source,
            need_volume_absorption=kcfg.need_volume_absorption, **common):
        return False
    return _psep.pallas_sep_eligible(
        domain, surface, source,
        need_volume_absorption=kcfg.need_volume_absorption, **common)


def run_broadband(cfg: SimulationConfig,
                  common=None, ssp_tables=None, mesh=None,
                  accumulator=None, start_batch: int = 0,
                  checkpoint_cb=None, resume_chunk_size=None) -> Results:
    """Broadband run. ``mesh``: None | jax Mesh | "auto" (photon-DP across
    devices per work unit); checkpointing mirrors run_simulation's.

    On resume, pass ``resume_chunk_size`` from the checkpoint metadata: the
    batch numbering depends on the chunk size (photons_per_batch x device
    count), so resuming under a different mesh would silently re-simulate or
    skip photons -- it is rejected instead.
    """
    t_start = time.time()
    from mcbrat3d_tpu.parallel.mesh import resolve_mesh, run_batch_sharded
    mesh = resolve_mesh(mesh)
    n_dev = 1 if mesh is None else mesh.devices.size
    if common is None:
        common = read_common(cfg.phys_domain_file)
    if ssp_tables is None:
        ssp_tables = [read_ssp_table(f) for f in cfg.ssp_file_names if f]
    if not ssp_tables:
        raise ValueError("broadband runs need at least one SSP table")
    grid = common.grid
    lambdas = ssp_tables[0].lambdas_um
    n_lambda = cfg.num_lambda or lambdas.size
    if n_lambda != lambdas.size:
        raise ValueError(f"namelist numLambda={n_lambda} but SSP tables have "
                         f"{lambdas.size} wavelengths")
    d_lambda = lambda_widths(lambdas)

    srf = None
    if cfg.instr_response_file:
        srf = solar_io.read_spectral_response(cfg.instr_response_file, n_lambda)

    # Lambda-independent factorization of the physical fields: when it
    # exists, per-bin domain rebuilds are O(nz) (domain/sep_plan.py)
    # instead of multiple full-grid host sweeps, and the LW setup Planck
    # sweep factorizes too. None on structures the separable kernel
    # cannot carry -- those fall back to the generic per-bin builds.
    plan = None
    if cfg.use_pallas != "off":
        plan = make_separable_bin_plan(common, ssp_tables,
                                       cfg.calc_rayleigh, cfg.macro_factor)

    # ---------------- spectral CDF ----------------
    if cfg.is_longwave:
        # Setup pass: per-lambda total emitted flux (atmosphere + surface),
        # vectorized over wavelength chunks instead of the reference's
        # rank-parallel per-bin loop
        # (reference: Drivers/monteCarloDriver.f95:304-450)
        fluxes = lw_setup_fluxes(common, ssp_tables, d_lambda,
                                 cfg.surface_temp, plan=plan)
        if srf is not None:
            fluxes = fluxes * srf
        cdf = kahan_cumsum(fluxes)
        total_flux = float(cdf[-1])
        cdf = cdf / total_flux
    else:
        lam_file, source = solar_io.read_solar_source(
            cfg.solar_source_file, n_lambda)
        cdf, total_flux = solar_weighting(lam_file, source, cfg.solar_mu,
                                          srf=srf)

    # ---------------- static photon schedule ----------------
    total_photons = cfg.num_photons_per_batch * cfg.num_batches
    freq = frequency_distribution(cdf, total_photons, seed=cfg.iseed)

    # ---------------- per-bin transport ----------------
    kcfg = kernel_config_from(cfg, n_devices=n_dev)
    chunk_size = kcfg.photons_per_batch * n_dev
    if start_batch > 0 and resume_chunk_size is not None \
            and resume_chunk_size != chunk_size:
        raise ValueError(
            f"checkpoint was written with chunk size {resume_chunk_size} "
            f"(photons_per_batch x devices) but this run uses {chunk_size}; "
            "resume with the same device count and batch size")
    icfg = idirs = None
    if cfg.compute_intensity:
        mus, phis = cfg.radiance_directions()
        idirs = make_intensity_directions(mus, phis)
        icfg = IntensityConfig(
            n_dirs=int(mus.size),
            use_russian_roulette=cfg.use_russian_roulette_intensity,
            zeta_min=cfg.zeta_min,
            use_hybrid_phase=cfg.use_hybrid_phase_funs,
            n_orders_orig_phase=cfg.num_orders_orig_phase,
            limit_contributions=cfg.limit_intensity_contributions,
            max_contribution=cfg.max_intensity_contribution)

    # Device-resident moments: one fused jitted update per batch instead
    # of per-batch host syncs + array fetches (~1 s/bin of fixed cost
    # through a relay-attached device at flagship scale -- see
    # core.accumulate.DeviceMomentAccumulator). Anything passed in as
    # ``accumulator`` (checkpoint resume) becomes the host-side base.
    from mcbrat3d_tpu.core.accumulate import DeviceMomentAccumulator
    acc = DeviceMomentAccumulator(base=accumulator)
    global_batch = 0
    # Per-bin domains start "full" (every kernel path available); once a
    # bin proves the separable megakernel dispatches, later bins rebuild
    # with device_fields="compact" (skipping ~1 GB/bin of per-cell device
    # uploads at flagship scale) and separable-backed emission sources
    # (skipping the per-bin 15.8M-voxel Planck CDF + alias build).
    compact = False
    # With a plan, probe sep-kernel eligibility on an O(nz) plan-built
    # domain BEFORE the loop: when the record kernel is structurally out
    # (cells > MAX_CELLS, so the sep kernel is the fast path that would
    # run anyway), bin 0 skips the full-domain build + upload + per-voxel
    # emission weighting entirely (~2-5 min at flagship scale).
    if plan is not None and kcfg.use_pallas != "off":
        import jax as _jax

        from mcbrat3d_tpu.transport import pallas_kernel as _pk
        from mcbrat3d_tpu.transport import pallas_sep as _psep
        nx_, ny_, nz_ = grid.shape
        on_tpu = _jax.default_backend() not in ("cpu", "gpu")
        li0 = next((int(li) for li in range(n_lambda) if freq[li] > 0), None)
        if ((on_tpu or kcfg.use_pallas == "on")
                and nx_ * ny_ * nz_ > _pk.MAX_CELLS and li0 is not None):
            lam0 = float(ssp_tables[0].lambdas_um[li0])
            alb0 = float(ssp_tables[0].surface_albedo[li0])
            d0 = build_domain_from_plan(
                grid, plan, li0, lam0, n_cdf_steps=cfg.n_phase_intervals,
                compute_intensity_tables=cfg.compute_intensity,
                hybrid_width_deg=(cfg.hybrid_phase_fun_width
                                  if cfg.use_hybrid_phase_funs else 0.0))
            if d0 is not None:
                s0 = Surface.lambertian(alb0, temperature=cfg.surface_temp,
                                        emissivity=1.0 - alb0)
                try:
                    src0 = (illumination.emission_separable(
                                d0, cfg.surface_temp, 1.0 - alb0)
                            if cfg.is_longwave else
                            illumination.directional(cfg.solar_mu,
                                                     cfg.solar_azimuth))
                except ValueError:
                    src0 = None  # no emission tables (non-uniform temps)
                if src0 is not None:
                    compact = _psep.pallas_sep_eligible(
                        d0, s0, src0, lw_mode=kcfg.lw_mode,
                        compute_intensity=icfg is not None,
                        record_scattering_orders=(
                            kcfg.record_scattering_orders),
                        use_ray_tracing=kcfg.use_ray_tracing,
                        need_volume_absorption=kcfg.need_volume_absorption)
    for li in range(n_lambda):
        if freq[li] <= 0:
            continue
        # Fast resume: skip whole bins already covered by the checkpoint
        n_chunks = -(-int(freq[li]) // chunk_size)
        if global_batch + n_chunks <= start_batch:
            global_batch += n_chunks
            continue
        hybrid_width = (cfg.hybrid_phase_fun_width
                        if cfg.use_hybrid_phase_funs else 0.0)
        domain = comps = None
        bin_compact = compact
        bin_kcfg = kcfg
        if compact and plan is not None:
            # O(nz) factorized rebuild: no 3D host arrays, no per-bin
            # re-detection (the plan proved the lambda-independent
            # structure once)
            lam_um = float(ssp_tables[0].lambdas_um[li])
            albedo = float(ssp_tables[0].surface_albedo[li])
            domain = build_domain_from_plan(
                grid, plan, li, lam_um,
                n_cdf_steps=cfg.n_phase_intervals,
                compute_intensity_tables=cfg.compute_intensity,
                hybrid_width_deg=hybrid_width)
            if domain is None:
                # degenerate bin (vacuum slab): fall back for THIS bin
                # only -- the plan still covers later bins. The generic
                # domain at plan scale is typically outside every
                # megakernel envelope, so a forced use_pallas='on' must
                # not make a physically-trivial bin a hard error.
                bin_compact = False
                if kcfg.use_pallas == "on":
                    bin_kcfg = dataclasses.replace(kcfg,
                                                   use_pallas="auto")
        if domain is None:
            comps, albedo, lam_um = components_from_ssp(
                common, ssp_tables, li, setup=False,
                calc_rayleigh=cfg.calc_rayleigh)
            build = dict(
                n_cdf_steps=cfg.n_phase_intervals,
                compute_intensity_tables=cfg.compute_intensity,
                hybrid_width_deg=hybrid_width,
                temps=common.temps, macro_factor=cfg.macro_factor,
                lambda_um=lam_um)
            if bin_compact:
                try:
                    domain = build_domain(grid, comps,
                                          device_fields="compact", **build)
                except ValueError:  # this bin broke the separable structure
                    bin_compact = False
                    if plan is None:
                        compact = False
                    domain = build_domain(grid, comps, **build)
            else:
                domain = build_domain(grid, comps, **build)
        surface = Surface.lambertian(albedo, temperature=cfg.surface_temp,
                                     emissivity=1.0 - albedo)
        if cfg.is_longwave:
            if bin_compact:
                source = illumination.emission_separable(
                    domain, cfg.surface_temp, 1.0 - albedo)
            else:
                kabs = absorption_coefficient(comps, grid)
                w = emission_weighting(grid, common.temps, kabs,
                                       cfg.surface_temp, 1.0 - albedo,
                                       lam_um)
                source = illumination.emission(w.voxel_cdf,
                                               w.frac_atms_power,
                                               grid.shape)
        else:
            source = illumination.directional(cfg.solar_mu, cfg.solar_azimuth)
        if not compact:
            compact = _sep_path_confirmed(domain, surface, source, kcfg,
                                          icfg)

        remaining = int(freq[li])
        while remaining > 0:
            n = min(remaining, chunk_size)
            if global_batch < start_batch:
                remaining -= n
                global_batch += 1
                continue
            if mesh is not None:
                t = run_batch_sharded(domain, surface, source, cfg.iseed,
                                      global_batch, bin_kcfg, mesh, icfg,
                                      idirs, n_photons=n)
            else:
                t = run_batch(domain, surface, source,
                              rng.batch_key(cfg.iseed, global_batch),
                              bin_kcfg, icfg, idirs, n_photons=n)
            # no host sync: normalization + moment update run as one
            # enqueued jitted dispatch; the host moves straight on to
            # the next bin's rebuild while the device transports
            acc.add_tallies(t, grid)
            remaining -= n
            global_batch += 1
            if (checkpoint_cb is not None
                    and cfg.checkpoint_every_batches > 0
                    and global_batch % cfg.checkpoint_every_batches == 0):
                checkpoint_cb(global_batch, acc, chunk_size)

    acc = acc.finalize()  # the loop's ONLY device->host moment fetch
    mean = {k: total_flux * acc.mean(k) for k in acc._sum_wx}
    stderr = {k: total_flux * acc.stderr(k) for k in acc._sum_wx}
    res = Results(mean=mean, stderr=stderr,
                  total_photons=int(round(acc.total_weight)),
                  n_batches=acc.n_batches,
                  solar_flux=total_flux,
                  elapsed_seconds=time.time() - t_start,
                  config=cfg, grid=grid)
    return res
