"""Batch-loop driver: runs batches, accumulates moments, finalizes results.

Role-equivalent of the reference's monteCarloDriver main loop + statistics
(reference: Drivers/monteCarloDriver.f95:889-1228): per batch, the
per-photon-normalized tallies x_b are accumulated as photon-weighted first
and second moments; the final mean is scaled by the incident flux and the
standard error is sqrt(max(0, E[x^2] - E[x]^2)/(nBatches - 1)).

The reference's dynamic MPI master-worker schedule is replaced by a static
schedule: batch b on an n-device mesh runs sub-batch streams
[b*n_dev, (b+1)*n_dev), making results independent of how work was spread.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.accumulate import MomentAccumulator
from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.driver.config import SimulationConfig
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.local_estimate import (
    IntensityConfig,
    make_intensity_directions,
)


@dataclasses.dataclass
class Results:
    """Finalized means and standard errors (float64, host)."""

    mean: dict
    stderr: dict
    total_photons: int
    n_batches: int
    solar_flux: float
    elapsed_seconds: float
    config: Optional[SimulationConfig] = None
    grid: object = None

    def __getitem__(self, name):
        return self.mean[name]


def kernel_config_from(cfg: SimulationConfig,
                       n_devices: int = 1) -> KernelConfig:
    """Per-device kernel config; numPhotonsPerBatch is the *global* batch
    size, split evenly across the mesh."""
    # Round capacity UP (ceil at both splits) and let the exact (traced)
    # n_photons clamp the count, so numPhotonsPerBatch is honored even when
    # it isn't a multiple of n_devices * n_lanes
    per_dev = max(1, -(-cfg.num_photons_per_batch // max(1, n_devices)))
    n_lanes = min(cfg.n_lanes, per_dev)
    ppl = max(1, -(-per_dev // n_lanes))
    return KernelConfig(
        n_lanes=n_lanes,
        photons_per_lane=ppl,
        max_steps=cfg.max_steps,
        use_ray_tracing=cfg.use_ray_tracing,
        use_russian_roulette=cfg.use_russian_roulette,
        lw_mode=cfg.is_longwave,
        record_scattering_orders=(cfg.num_rec_scat_ord
                                  if cfg.rec_scat_ord else 0),
        # the 3D tally is required when EITHER namelist surface asks for
        # it (reportVolumeAbsorption, or an outputAbsVolumeFile that would
        # otherwise be silently skipped); without it, Landsat-scale
        # column-template domains take the column megakernel (flux +
        # column absorption + z profile)
        need_volume_absorption=(cfg.report_volume_absorption
                                or bool(cfg.output_abs_volume_file)),
        # the record kernel derives the profile from its volume rows, so
        # a profile request must keep them (flux_abs_2d gates on this);
        # the column/separable kernels tally the profile natively
        need_absorption_profile=(cfg.report_absorption_profile
                                 or bool(cfg.output_abs_prof_file)),
        use_pallas=cfg.use_pallas,
    )


def run_simulation(domain: OpticalDomain,
                   surface: Surface,
                   source: illumination.Source,
                   cfg: SimulationConfig,
                   solar_flux: float = 1.0,
                   mesh=None,
                   accumulator: Optional[MomentAccumulator] = None,
                   start_batch: int = 0,
                   checkpoint_cb=None,
                   resume_chunk_size=None) -> Results:
    """Run cfg.num_batches batches and return finalized statistics.

    ``solar_flux`` scales all outputs (reference:
    Drivers/monteCarloDriver.f95:1188-1228); pass 1.0 for normalized units.
    ``accumulator``/``start_batch`` support checkpoint resume.
    ``mesh``: a jax Mesh for multi-chip photon-DP, or "auto" to span all
    local devices when more than one is present.
    """
    from mcbrat3d_tpu.parallel.mesh import resolve_mesh
    mesh = resolve_mesh(mesh)
    n_dev = 1 if mesh is None else mesh.devices.size
    kcfg = kernel_config_from(cfg, n_devices=n_dev)
    if start_batch > 0 and resume_chunk_size is not None \
            and resume_chunk_size != kcfg.photons_per_batch * n_dev:
        raise ValueError(
            f"checkpoint was written with chunk size {resume_chunk_size} "
            f"but this run uses {kcfg.photons_per_batch * n_dev}; resume "
            "with the same device count and batch size")
    icfg = None
    idirs = None
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
            max_contribution=cfg.max_intensity_contribution,
        )

    acc = accumulator if accumulator is not None else MomentAccumulator()
    t0 = time.time()

    for b in range(start_batch, cfg.num_batches):
        if mesh is not None:
            from mcbrat3d_tpu.parallel.mesh import run_batch_sharded
            t = run_batch_sharded(domain, surface, source, cfg.iseed, b,
                                  kcfg, mesh, icfg, idirs,
                                  n_photons=cfg.num_photons_per_batch)
        else:
            key = rng.batch_key(cfg.iseed, b)
            t = run_batch(domain, surface, source, key, kcfg, icfg, idirs,
                          n_photons=cfg.num_photons_per_batch)
        t = t.normalized(domain.grid)
        n = int(t.n_photons)

        arrays = {
            "flux_up": np.asarray(t.flux_up),
            "flux_down": np.asarray(t.flux_down),
            "flux_absorbed": np.asarray(t.flux_absorbed),
        }
        # the column megakernel (big domains) tallies the z marginal
        # directly instead of the full 3D field
        if t.volume_absorption is not None:
            arrays["volume_absorption"] = np.asarray(t.volume_absorption)
        # Domain means + horizontally averaged absorption profile
        # (reportResults equivalents; reference:
        # Integrators/monteCarloRadiativeTransfer.f95:845-1042)
        arrays["mean_flux_up"] = arrays["flux_up"].mean()
        arrays["mean_flux_down"] = arrays["flux_down"].mean()
        arrays["mean_flux_absorbed"] = arrays["flux_absorbed"].mean()
        if t.absorption_profile is not None:
            arrays["absorption_profile"] = np.asarray(t.absorption_profile)
        elif t.volume_absorption is not None:
            arrays["absorption_profile"] = arrays[
                "volume_absorption"].mean(axis=(0, 1))
        if t.intensity is not None:
            arrays["intensity"] = np.asarray(t.intensity)
        if t.flux_up_by_order is not None:
            arrays["flux_up_by_order"] = np.asarray(t.flux_up_by_order)
            arrays["flux_down_by_order"] = np.asarray(t.flux_down_by_order)

        acc.add(float(n), arrays)
        if checkpoint_cb is not None and cfg.checkpoint_every_batches > 0 \
                and (b + 1) % cfg.checkpoint_every_batches == 0:
            checkpoint_cb(b + 1, acc, kcfg.photons_per_batch * n_dev)

    elapsed = time.time() - t0
    mean = {k: solar_flux * acc.mean(k) for k in acc._sum_wx}
    stderr = {k: solar_flux * acc.stderr(k) for k in acc._sum_wx}
    return Results(mean=mean, stderr=stderr,
                   total_photons=int(acc.total_weight),
                   n_batches=acc.n_batches,
                   solar_flux=solar_flux,
                   elapsed_seconds=elapsed,
                   config=cfg)
