"""High-level simulation assembly: config -> domain -> run -> outputs.

The monochromatic path mirrors the reference driver's mono flow (read
domain, directional solar source, batches); the broadband SW/LW paths are
wired through the spectral layer (mcbrat3d_tpu.spectral) following the
reference's setup (reference: Drivers/monteCarloDriver.f95:289-505).
"""

from __future__ import annotations

from typing import List, Tuple

from mcbrat3d_tpu.domain import io_netcdf
from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.driver import output as output_mod
from mcbrat3d_tpu.driver.config import SimulationConfig
from mcbrat3d_tpu.driver.run import Results, run_simulation
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination


def _checkpoint_hooks(cfg: SimulationConfig) -> dict:
    """Resume-from + periodic-save kwargs for the run functions, driven by
    the checkpointFile / checkpointEveryBatches namelist knobs (the
    periodic-checkpoint machinery the reference designed but disabled;
    reference: Drivers/monteCarloDriver.f95:127-134,753-801)."""
    import os

    from mcbrat3d_tpu.driver import checkpoint as ckpt

    if not cfg.checkpoint_file:
        return {}
    out: dict = {}
    if os.path.exists(cfg.checkpoint_file):
        next_batch, acc, chunk = ckpt.load_checkpoint(cfg.checkpoint_file,
                                                      with_meta=True)
        out["accumulator"] = acc
        out["start_batch"] = next_batch
        out["resume_chunk_size"] = chunk or None
    if cfg.checkpoint_every_batches > 0:
        out["checkpoint_cb"] = (
            lambda b, acc, chunk: ckpt.save_checkpoint(
                cfg.checkpoint_file, b, acc, chunk))
    return out


def simulate_from_config(cfg: SimulationConfig) -> Tuple[Results, List[str]]:
    if cfg.num_lambda > 1 or cfg.is_longwave:
        from mcbrat3d_tpu.spectral.broadband import run_broadband
        results = run_broadband(cfg, mesh="auto", **_checkpoint_hooks(cfg))
        written = output_mod.write_all(results, results.grid)
        return results, written

    if not cfg.domain_file:
        raise ValueError("monochromatic runs need domainFileName")
    grid, components, temps, attrs = io_netcdf.read_domain(cfg.domain_file)
    domain = build_domain(
        grid, components,
        n_cdf_steps=cfg.n_phase_intervals,
        compute_intensity_tables=cfg.compute_intensity,
        hybrid_width_deg=(cfg.hybrid_phase_fun_width
                          if cfg.use_hybrid_phase_funs else 0.0),
        temps=temps,
        macro_factor=cfg.macro_factor,
        lambda_um=attrs.get("lambda_um", 0.0))
    surface = Surface.lambertian(attrs.get("surface_albedo", 0.0))
    source = illumination.directional(cfg.solar_mu, cfg.solar_azimuth)

    # Monochromatic runs take solarFlux from the namelist, default 1.0
    # (reference: Drivers/OLDmonteCarloDriver.f95:56,98); broadband runs
    # compute it from the spectral integration instead.
    resume = _checkpoint_hooks(cfg)
    results = run_simulation(domain, surface, source, cfg,
                             solar_flux=cfg.solar_flux, mesh="auto",
                             **resume)
    results.grid = grid
    written = output_mod.write_all(results, grid)
    return results, written
