"""The Monte Carlo transport megakernel.

TPU-first re-design of the reference integrator's hot loop
(reference: Integrators/monteCarloRadiativeTransfer.f95:393-841, computeRT).
The reference traces one photon at a time through nested branchy loops; here
a *wave* of ``n_lanes`` photons advances together inside one
``lax.while_loop``:

  * struct-of-arrays photon state [N]; every branch is a masked select,
  * persistent-lane refill: when a photon terminates, its lane immediately
    samples a new photon from the source until the lane's quota is used, so
    vector lanes stay busy (replaces the photon loop),
  * maximum cross-section (Woodcock/Marchuk) free-path sampling by default
    (reference's second mode; reference:
    Integrators/monteCarloRadiativeTransfer.f95:566-571,709-710) -- one
    fused move + null-collision test per step, no ray marching in the hot
    loop,
  * counter-based RNG (threefry fold-in per step/draw-site) instead of
    sequential MT19937,
  * analytic azimuth rotation instead of Marchuk's rejection disk
    (statistically identical; reference: NEXT_DIRECT,
    Integrators/monteCarloRadiativeTransfer.f95:1921-1948).

Memory-access design (the performance-critical part on TPU, where random
gathers cost per index):
  * ONE packed record gather per step delivers extinction, cumulative
    extinction, albedo, phase index and HG asymmetry for the collision cell
    (see OpticalDomain.cell_records),
  * Henyey-Greenstein domains sample the scattering angle *analytically*
    (zero table gathers); tabulated phase functions fall back to the
    inverse-CDF interpolation (two gathers),
  * tallies accumulate via one-hot MXU contractions for small buffers and
    scatter-add for large ones (transport.tally).

Tallies are float32 within a batch and promoted to float64 across batches by
the driver, mirroring the reference's batch-moment structure.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport import dda
from mcbrat3d_tpu.transport.tally import make_accumulator
from mcbrat3d_tpu.transport.local_estimate import (
    IntensityConfig,
    accumulate_local_estimate,
    redistribute_excess,
)

_W_TINY = np.float32(1e-30)  # photon-weight cutoff (reference uses tiny(real))


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Static algorithm switches (one XLA program per distinct config).

    Mirrors the reference's `algorithms` namelist
    (reference: Drivers/monteCarloDriver.f95:110-118, specifyParameters
    Integrators/monteCarloRadiativeTransfer.f95:1046-1337).
    """

    n_lanes: int = 1 << 17
    photons_per_lane: int = 8
    max_steps: int = 20_000
    use_ray_tracing: bool = False  # False -> maximum cross-section (Woodcock)
    use_russian_roulette: bool = True
    russian_roulette_weight: float = 1.0
    lw_mode: bool = False  # emission pre-credits to absorption tallies
    max_dda_crossings: int = 0  # 0 -> auto (4 * (nx+ny+nz))
    # Per-scattering-order boundary-flux tallies (recScatOrd): orders
    # 0..K-1 plus an overflow bin (the reference designed but disabled
    # this; reference: Drivers/monteCarloDriver.f95:98-99,
    # Integrators/monteCarloRadiativeTransfer.f95:109-115).
    record_scattering_orders: int = 0
    # Compact straggler photons into a 16x smaller wave once all quotas are
    # spent (the wave otherwise runs at full width until the last photon
    # dies). Pure performance knob; statistics are unchanged.
    tail_compaction: bool = True
    # VMEM-resident Pallas megakernel (transport.pallas_kernel): "auto"
    # uses it on TPU whenever the configuration is eligible; "on" forces it
    # (errors if ineligible); "off" always runs the XLA wave kernel.
    use_pallas: str = "auto"
    # Whether the caller requires the full 3D volume-absorption tally.
    # False lets big column-template domains (Landsat-scale) use the
    # column megakernel, which tallies fluxes, per-column absorption, and
    # the z absorption profile but not the 3D field. The driver sets this
    # from the reportVolumeAbsorption namelist option.
    need_volume_absorption: bool = True
    # The horizontally averaged absorption PROFILE is requested
    # (reportAbsorptionProfile). The column/separable kernels tally it
    # natively; the record kernel derives it from the volume rows, so
    # the flux_abs_2d fast path (no volume rows) additionally requires
    # this to be False.
    need_absorption_profile: bool = False
    # Comma-set of megakernel debug/ablation switches forwarded verbatim
    # to PallasConfig.debug_parts (e.g. "all,nodyn" forces the one-hot
    # gather, "all,nohif" the lo-first big-table form). Measurement
    # A/B knob only; "all" (the default) is the production kernel. The
    # XLA wave kernel ignores it.
    pallas_debug_parts: str = "all"

    @property
    def photons_per_batch(self) -> int:
        return self.n_lanes * self.photons_per_lane


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Tallies:
    """Per-batch tally arrays (unnormalized photon weights).

    Equivalent of the integrator's tally fields
    (reference: Integrators/monteCarloRadiativeTransfer.f95:40-117).
    """

    flux_up: jax.Array  # [nx, ny]
    flux_down: jax.Array  # [nx, ny]
    flux_absorbed: jax.Array  # [nx, ny]
    # None on the column-megakernel path (big domains tally the z marginal
    # in absorption_profile instead of the full 3D field)
    volume_absorption: Optional[jax.Array]  # [nx, ny, nz] or None
    absorption_profile: Optional[jax.Array] = None  # [nz] z marginal
    intensity: Optional[jax.Array] = None  # [nx, ny, ndir]
    flux_up_by_order: Optional[jax.Array] = None  # [nx, ny, K+1]
    flux_down_by_order: Optional[jax.Array] = None  # [nx, ny, K+1]
    n_photons: jax.Array = None  # scalar i32: photons started
    n_bad: jax.Array = None  # scalar i32: photons killed by the step cap
    n_steps: jax.Array = None  # scalar i32: wave steps executed (diagnostic)

    def normalized(self, grid: Grid) -> "Tallies":
        """Per-column normalization (reference:
        Integrators/monteCarloRadiativeTransfer.f95:326-389): fluxes and
        intensity divided by photons-per-column; volume absorption also by
        cell depth * 1000 (km -> m) to yield W m^-3 per unit incident flux.
        """
        nx, ny, nz = grid.shape
        n = jnp.maximum(self.n_photons.astype(jnp.float32), 1.0)
        # Photons land per column in proportion to its area (sources sample
        # x/y uniformly over the domain), so irregular x/y spacings weight
        # numPhotonsPerColumn by relative column area (reference:
        # Integrators/monteCarloRadiativeTransfer.f95:330-343). For regular
        # grids this reduces to n / (nx * ny) exactly.
        dxs = jnp.asarray(grid.x_edges[1:] - grid.x_edges[:-1], jnp.float32)
        dys = jnp.asarray(grid.y_edges[1:] - grid.y_edges[:-1], jnp.float32)
        area = dxs[:, None] * dys[None, :]
        per_col = n * (area / jnp.sum(area))  # [nx, ny]
        per_col3 = per_col[:, :, None]
        dz = grid.z_edges[1:] - grid.z_edges[:-1]
        return Tallies(
            flux_up=self.flux_up / per_col,
            flux_down=self.flux_down / per_col,
            flux_absorbed=self.flux_absorbed / per_col,
            volume_absorption=None if self.volume_absorption is None
            else self.volume_absorption
            / (per_col3 * dz[None, None, :] * 1000.0),
            # horizontal mean of W m^-3: the z marginal divided by the
            # total photon count and cell depth (equals the column mean of
            # the normalized 3D field on regular-xy grids)
            absorption_profile=None if self.absorption_profile is None
            else self.absorption_profile / (n * dz * 1000.0),
            intensity=None if self.intensity is None
            else self.intensity / per_col3,
            flux_up_by_order=None if self.flux_up_by_order is None
            else self.flux_up_by_order / per_col3,
            flux_down_by_order=None if self.flux_down_by_order is None
            else self.flux_down_by_order / per_col3,
            n_photons=self.n_photons,
            n_bad=self.n_bad,
            n_steps=self.n_steps,
        )


def make_direction_cosines(mu, phi):
    """(mu, phi) -> unit direction cosines (reference:
    Integrators/monteCarloRadiativeTransfer.f95:1876-1894)."""
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
    return sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), mu


def rotate_direction(ux, uy, uz, cos_theta, phi):
    """Rotate a unit vector by scattering angle theta with azimuth phi.

    Branch-free analytic replacement for the reference's Marchuk rejection
    construction (reference:
    Integrators/monteCarloRadiativeTransfer.f95:1921-1948); for uniform phi
    the distributions are identical.
    """
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cos_phi = jnp.cos(phi)
    sin_phi = jnp.sin(phi)
    denom_sq = jnp.maximum(1.0 - uz * uz, 0.0)
    denom = jnp.sqrt(denom_sq)
    safe = denom > 1e-6

    inv_denom = jnp.where(safe, 1.0 / jnp.maximum(denom, 1e-12), 0.0)
    nx = ux * cos_theta + sin_theta * (ux * uz * cos_phi - uy * sin_phi) * inv_denom
    ny = uy * cos_theta + sin_theta * (uy * uz * cos_phi + ux * sin_phi) * inv_denom
    nz = uz * cos_theta - sin_theta * cos_phi * denom

    sgn = jnp.sign(jnp.where(uz == 0, 1.0, uz))
    vx = sin_theta * cos_phi
    vy = sgn * sin_theta * sin_phi
    vz = sgn * cos_theta

    ox = jnp.where(safe, nx, vx)
    oy = jnp.where(safe, ny, vy)
    oz = jnp.where(safe, nz, vz)
    # Guard against horizontally trapped photons: a scattered direction
    # with |uz| ~ 0 needs ~1/|uz| steps to cross a clear layer (the
    # reference applies the same minimum-vertical-component guard at its
    # sources; reference: src/monteCarloIllumination.f95:301-304). The
    # 1e-4 clamp perturbs ~0.01% of directions by <= 1e-4 in mu.
    oz = jnp.where(jnp.abs(oz) < 1e-4,
                   jnp.sign(jnp.where(oz == 0, 1.0, oz)) * 1e-4, oz)
    # Renormalize to keep |u| = 1 over long photon lifetimes (f32 drift)
    inv_norm = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)
    return ox * inv_norm, oy * inv_norm, oz * inv_norm


def sample_hg_cos(g, u):
    """Analytic Henyey-Greenstein scattering-cosine sampling.

    cos(theta) = (1 + g^2 - ((1-g^2)/(1-g+2gu))^2) / (2g), with the
    isotropic limit for |g| ~ 0. Exact inverse of the HG CDF -- statistically
    identical to the reference's inverse-CDF table lookup for HG functions
    but with zero memory traffic.
    """
    safe_g = jnp.where(jnp.abs(g) < 1e-5, 1.0, g)
    s = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    ct = (1.0 + g * g - s * s) / (2.0 * safe_g)
    return jnp.where(jnp.abs(g) < 1e-5, 2.0 * u - 1.0,
                     jnp.clip(ct, -1.0, 1.0))


def sample_scattering_cos(inverse_flat, n_steps, row, u):
    """Scattering cosine by linear interpolation of the inverse CDF table
    (reference: computeScatteringAngle,
    Integrators/monteCarloRadiativeTransfer.f95:1594-1621)."""
    t = u * (n_steps - 1)
    k = jnp.clip(t.astype(jnp.int32), 0, n_steps - 2)
    frac = t - k.astype(jnp.float32)
    base = row * n_steps + k
    a0 = inverse_flat[base]
    a1 = inverse_flat[base + 1]
    angle = (1.0 - frac) * a0 + frac * a1
    return jnp.cos(angle)


def run_batch(domain: OpticalDomain,
              surface: Surface,
              source: illumination.Source,
              key: jax.Array,
              config: KernelConfig,
              intensity_config: Optional[IntensityConfig] = None,
              intensity_dirs: Optional[jax.Array] = None,
              n_photons: Optional[jax.Array] = None,
              debug_state: bool = False) -> Tallies:
    """Trace one batch of photons; return unnormalized tallies.

    ``key`` identifies the batch (seed x batch index); results are
    deterministic in (key, config) and independent of device placement.
    ``n_photons`` (traced) overrides config.photons_per_batch so spectral
    bins with uneven photon counts reuse one compiled kernel; it must be
    <= config.photons_per_batch.

    This wrapper validates the radiance-direction mu floor on CONCRETE
    direction values before entering jit (the in-kernel DDA march bound is
    static and truncates shallower directions); the result threads into
    the jitted implementation as a static flag. Called with traced
    ``intensity_dirs`` (e.g. inside another jit), the in-kernel radiance
    path is refused and the XLA estimator runs instead.
    """
    from mcbrat3d_tpu.transport import pallas_kernel as _pk
    if (intensity_config is not None
            and domain.tables.forward_orig.shape[1] == 1
            and not domain.all_hg):
        # Without tabulated forward phase functions the XLA estimator
        # reads a zeros placeholder and silently produces ~zero radiance
        # (the reference always tabulates them for intensity runs;
        # reference: Integrators/monteCarloRadiativeTransfer.f95:280-285).
        # All-HG domains are exempt: both the megakernel and the XLA
        # estimator evaluate the HG phase function analytically.
        raise ValueError(
            "intensity requested but the domain has no forward phase "
            "tables; build the domain with compute_intensity_tables=True")
    dirs_mu_ok = _pk.dirs_mu_floor_ok(intensity_config, intensity_dirs)
    if (intensity_config is not None
            and intensity_config.n_dirs > _pk.MAX_KERNEL_DIRS
            and not debug_state):
        chunked = _run_batch_dir_chunked(
            domain, surface, source, config, intensity_config,
            intensity_dirs, dirs_mu_ok,
            lambda icfg_c, dirs_c: run_batch(
                domain, surface, source, key, config, icfg_c, dirs_c,
                n_photons))
        if chunked is not None:
            return chunked
    # per-direction march plan (formulation + static bound) from the
    # concrete direction cosines -- inside the jitted impl the dirs are
    # tracers and the megakernel would fall back to loose global bounds
    march_plan = None
    try:
        march_plan = _pk.plan_march(domain.grid, intensity_config,
                                    intensity_dirs)
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        pass
    # column-kernel slab-scan radiance plan (Landsat-scale domains the
    # record kernel can't hold; see pallas_col.plan_col_march)
    col_march_plan = None
    if intensity_config is not None:
        from mcbrat3d_tpu.transport import pallas_col as _pc
        try:
            col_march_plan = _pc.plan_col_march(
                domain.grid, domain, intensity_config, intensity_dirs)
        except (TypeError, jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            pass
    return _run_batch_impl(domain, surface, source, key, config,
                           intensity_config, intensity_dirs, n_photons,
                           debug_state=debug_state, dirs_mu_ok=dirs_mu_ok,
                           march_plan=march_plan,
                           col_march_plan=col_march_plan)


def _run_batch_dir_chunked(domain, surface, source, config,
                           icfg, dirs, dirs_mu_ok,
                           run_chunk) -> Optional[Tallies]:
    """Direction-chunked radiance: split a > MAX_KERNEL_DIRS direction
    grid into in-kernel-sized transport passes over the SAME photons.

    The reference's production radiance grids reach 648 directions
    (reference: Drivers/monteCarloDriver.f95:61); the megakernel's
    per-launch cap is MAX_KERNEL_DIRS. Re-tracing the same batch key per
    chunk reuses the photon paths, so fluxes are identical across chunks
    (chunk 0's are kept) and each direction's local-estimate image is
    the standard estimator over those paths. Cross-CHUNK direction pairs
    share per-direction RR random sites (within a chunk they differ), a
    correlation of the same order as the path-sharing all directions
    already have; per-direction estimates stay unbiased.

    Returns None when the configuration wouldn't run in-kernel anyway --
    a single XLA-estimator pass handles any direction count and
    re-running transport per chunk would only add cost.
    """
    from mcbrat3d_tpu.transport import pallas_kernel as _pk
    if dirs is None or isinstance(dirs, jax.core.Tracer):
        return None
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (on_tpu or config.use_pallas == "on") \
            or config.use_pallas == "off":
        return None
    max_dirs = _pk.MAX_KERNEL_DIRS
    icfg0 = dataclasses.replace(icfg, n_dirs=min(icfg.n_dirs, max_dirs))
    if not _pk.pallas_intensity_eligible(
            domain, surface, source, lw_mode=config.lw_mode,
            record_scattering_orders=config.record_scattering_orders,
            use_ray_tracing=config.use_ray_tracing,
            icfg=icfg0, dirs=dirs[:, :icfg0.n_dirs],
            dirs_mu_ok=dirs_mu_ok):
        from mcbrat3d_tpu.transport import pallas_col as _pc
        if not _pc.pallas_col_intensity_eligible(
                domain, surface, source, config.lw_mode,
                config.record_scattering_orders, config.use_ray_tracing,
                icfg0, dirs[:, :icfg0.n_dirs], dirs_mu_ok,
                config.need_volume_absorption):
            return None
    d_np = np.asarray(dirs)
    first: Optional[Tallies] = None
    images = []
    for lo in range(0, icfg.n_dirs, max_dirs):
        hi = min(icfg.n_dirs, lo + max_dirs)
        icfg_c = dataclasses.replace(icfg, n_dirs=hi - lo)
        t = run_chunk(icfg_c, jnp.asarray(d_np[:, lo:hi]))
        images.append(t.intensity)
        if first is None:
            first = t
    return dataclasses.replace(
        first, intensity=jnp.concatenate(images, axis=-1))


@functools.partial(
    jax.jit,
    static_argnames=("config", "intensity_config", "debug_state",
                     "dirs_mu_ok", "march_plan", "col_march_plan"),
)
def _run_batch_impl(domain: OpticalDomain,
                    surface: Surface,
                    source: illumination.Source,
                    key: jax.Array,
                    config: KernelConfig,
                    intensity_config: Optional[IntensityConfig] = None,
                    intensity_dirs: Optional[jax.Array] = None,
                    n_photons: Optional[jax.Array] = None,
                    debug_state: bool = False,
                    dirs_mu_ok: bool = False,
                    march_plan=None,
                    col_march_plan=None) -> Tallies:
    cfg = config

    # ---- TPU fast path: VMEM-resident Pallas megakernel ----
    if cfg.use_pallas != "off" and not debug_state:
        from mcbrat3d_tpu.transport import pallas_kernel as _pk
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if intensity_config is not None:
            # in-kernel local estimation (exact non-RR estimator)
            i_ok = _pk.pallas_intensity_eligible(
                domain, surface, source, lw_mode=cfg.lw_mode,
                record_scattering_orders=cfg.record_scattering_orders,
                use_ray_tracing=cfg.use_ray_tracing,
                icfg=intensity_config, dirs=intensity_dirs,
                dirs_mu_ok=dirs_mu_ok)
            if i_ok and (on_tpu or cfg.use_pallas == "on"):
                return _pk.run_batch_pallas_tallies(
                    domain, surface, source, key, cfg, n_photons,
                    interpret=not on_tpu,
                    intensity_config=intensity_config,
                    intensity_dirs=intensity_dirs,
                    march_plan=march_plan)
            # Landsat-scale radiance: column-kernel slab-scan local
            # estimation (reference: Drivers/monteCarloDriver.f95:61,
            # Domain-Files/i3rcLandsatCloud.f95:27-40)
            from mcbrat3d_tpu.transport import pallas_col as _pcI
            ci_ok = _pcI.pallas_col_intensity_eligible(
                domain, surface, source, cfg.lw_mode,
                cfg.record_scattering_orders, cfg.use_ray_tracing,
                intensity_config, intensity_dirs, dirs_mu_ok,
                cfg.need_volume_absorption)
            if (ci_ok and col_march_plan is not None
                    and (on_tpu or cfg.use_pallas == "on")):
                return _pcI.run_batch_pallas_col_tallies(
                    domain, surface, source, key, cfg, n_photons,
                    interpret=not on_tpu,
                    intensity_config=intensity_config,
                    intensity_dirs=intensity_dirs,
                    march_plan=col_march_plan)
        else:
            eligible = _pk.pallas_eligible(
                domain, surface, source,
                lw_mode=cfg.lw_mode, compute_intensity=False,
                record_scattering_orders=cfg.record_scattering_orders,
                use_ray_tracing=cfg.use_ray_tracing)
            # Dense domains past the dyn-gather row envelope: the record
            # kernel's one-hot fetch is Theta(cells)/lane (measured
            # 0.405 M photons/s at 16384 cells vs 3.19 M dyn-gather,
            # tools/exp_tile1.py) -- when the TILED megakernel covers the
            # configuration, prefer it (per-tile slabs keep the fetch on
            # the measured-flat select chain at any cell count).
            if eligible:
                nxd, nyd, nzd = domain.grid.shape
                if nxd * nyd * nzd > 128 * 128:
                    from mcbrat3d_tpu.transport import pallas_tile as _pt
                    if _pt.pallas_tile_eligible(
                            domain, surface, source, cfg.lw_mode, False,
                            cfg.record_scattering_orders,
                            cfg.use_ray_tracing,
                            cfg.need_volume_absorption,
                            cfg.need_absorption_profile):
                        eligible = False  # dispatch below, to the tile path
            if cfg.use_pallas == "on" and eligible:
                return _pk.run_batch_pallas_tallies(
                    domain, surface, source, key, cfg, n_photons,
                    interpret=not on_tpu)
            if eligible and on_tpu:
                return _pk.run_batch_pallas_tallies(
                    domain, surface, source, key, cfg, n_photons)
        # ---- big-domain column-template megakernel ----
        from mcbrat3d_tpu.transport import pallas_col as _pc
        col_eligible = _pc.pallas_col_eligible(
            domain, surface, source,
            lw_mode=cfg.lw_mode,
            compute_intensity=intensity_config is not None,
            record_scattering_orders=cfg.record_scattering_orders,
            use_ray_tracing=cfg.use_ray_tracing,
            need_volume_absorption=cfg.need_volume_absorption)
        if col_eligible and (on_tpu or cfg.use_pallas == "on"):
            return _pc.run_batch_pallas_col_tallies(
                domain, surface, source, key, cfg, n_photons,
                interpret=not on_tpu)
        # ---- flagship-scale separable-template megakernel ----
        from mcbrat3d_tpu.transport import pallas_sep as _psep
        sep_eligible = _psep.pallas_sep_eligible(
            domain, surface, source,
            lw_mode=cfg.lw_mode,
            compute_intensity=intensity_config is not None,
            record_scattering_orders=cfg.record_scattering_orders,
            use_ray_tracing=cfg.use_ray_tracing,
            need_volume_absorption=cfg.need_volume_absorption)
        if sep_eligible and (on_tpu or cfg.use_pallas == "on"):
            return _psep.run_batch_pallas_sep_tallies(
                domain, surface, source, key, cfg, n_photons,
                interpret=not on_tpu)
        # ---- dense non-template tiled megakernel (general 3D domains
        # past every template envelope; the BASELINE.md MODIS class) ----
        from mcbrat3d_tpu.transport import pallas_tile as _pt
        tile_eligible = _pt.pallas_tile_eligible(
            domain, surface, source, cfg.lw_mode,
            intensity_config is not None, cfg.record_scattering_orders,
            cfg.use_ray_tracing, cfg.need_volume_absorption,
            cfg.need_absorption_profile)
        if tile_eligible and (on_tpu or cfg.use_pallas == "on"):
            return _pt.run_batch_pallas_tile_tallies(
                domain, surface, source, key, cfg, n_photons,
                interpret=not on_tpu)
        if cfg.use_pallas == "on":
            reasons = _pk.ineligibility_reasons(
                domain, surface, source, lw_mode=cfg.lw_mode,
                compute_intensity=intensity_config is not None,
                record_scattering_orders=cfg.record_scattering_orders,
                use_ray_tracing=cfg.use_ray_tracing)
            if intensity_config is not None:
                reasons = _pk.intensity_ineligibility_reasons(
                    domain, surface, source, cfg.lw_mode,
                    cfg.record_scattering_orders, cfg.use_ray_tracing,
                    intensity_config, intensity_dirs, dirs_mu_ok)
            t_reasons = _pt.tile_ineligibility_reasons(
                domain, surface, source, cfg.lw_mode,
                intensity_config is not None,
                cfg.record_scattering_orders, cfg.use_ray_tracing,
                cfg.need_volume_absorption, cfg.need_absorption_profile)
            raise ValueError(
                "use_pallas='on' but the configuration is outside every "
                "megakernel envelope; failing predicates: "
                + "; ".join(reasons)
                + "; tiled kernel: " + "; ".join(t_reasons))

    # Compact domains / separable-backed emission sources carry no
    # per-cell fields -- only the separable megakernel can run them.
    if domain.cell_records is None or getattr(source, "em_sep", False):
        from mcbrat3d_tpu.transport import pallas_sep as _psep
        reasons = _psep.sep_ineligibility_reasons(
            domain, surface, source, cfg.lw_mode,
            intensity_config is not None, cfg.record_scattering_orders,
            cfg.use_ray_tracing, cfg.need_volume_absorption)
        what = ("domain was built with device_fields='compact'"
                if domain.cell_records is None
                else "source is emission_separable")
        raise ValueError(
            f"{what}, which only the separable megakernel supports, but "
            "the run did not dispatch there "
            + ("(use_pallas != 'on' and not on TPU)" if not reasons else
               "; failing predicates: " + "; ".join(reasons)))

    grid = domain.grid
    nx, ny, nz = grid.shape
    nxy = nx * ny
    nxyz = nxy * nz
    ncomp = domain.n_components
    N = cfg.n_lanes

    records = domain.cell_records  # [nxyz, 2 + 4*ncomp]
    inv_flat = domain.tables.inverse.reshape(-1)
    n_cdf_steps = domain.tables.inverse.shape[1]
    offsets = domain.tables.offsets

    beta_max = jnp.maximum(domain.max_extinction, _W_TINY)
    inv_beta_max = 1.0 / beta_max

    x0, x_max = grid.x0, grid.x_max
    y0, y_max = grid.y0, grid.y_max
    z0, z_max = grid.z0, grid.z_max
    z_eps = (z_max - z0) * jnp.float32(1e-6)

    compute_intensity = intensity_config is not None
    n_dirs = 0 if not compute_intensity else intensity_config.n_dirs

    rr_w = jnp.float32(cfg.russian_roulette_weight)

    # One combined tally buffer: [fluxUp | fluxDown | volumeAbsorption].
    # Per step a lane contributes at most ONE update (top exit, bottom exit,
    # or absorption at a real collision); the pixel-level absorbed flux is
    # derived afterwards as the vertical sum of volume absorption, so no
    # separate accumulation is needed.
    tally_add = make_accumulator(2 * nxy + nxyz)

    f32 = jnp.float32
    zeros = jnp.zeros((N,), f32)

    if n_photons is None:
        quota0 = jnp.full((N,), cfg.photons_per_lane, jnp.int32)
    else:
        n_photons = jnp.minimum(jnp.asarray(n_photons, jnp.int32),
                                cfg.photons_per_batch)
        lane = jnp.arange(N, dtype=jnp.int32)
        quota0 = (n_photons // N) + (lane < (n_photons % N)).astype(jnp.int32)

    use_macro = domain.macro_factor > 0 and not cfg.use_ray_tracing
    if use_macro:
        # Macro-box geometry (regular grid guaranteed by build_domain)
        mf = domain.macro_factor
        bx_w = (grid.x_edges[1] - grid.x_edges[0]) * mf
        by_w = (grid.y_edges[1] - grid.y_edges[0]) * mf
        bz_w = (grid.z_edges[1] - grid.z_edges[0]) * mf
        clip_nudge = jnp.float32(1e-5) * jnp.minimum(
            bx_w, jnp.minimum(by_w, bz_w))

    state0 = dict(
        x=zeros, y=zeros, z=zeros,
        ux=zeros, uy=zeros, uz=jnp.ones((N,), f32),
        w=zeros,
        alive=jnp.zeros((N,), bool),
        quota=quota0,
        order=jnp.zeros((N,), jnp.int32),
        beta_loc=jnp.full((N,), beta_max),  # carried local majorant
    )
    n_orders = cfg.record_scattering_orders
    scat0 = jnp.zeros((2 * (n_orders + 1) * nxy if n_orders > 0 else 1,), f32)
    scat_add = make_accumulator(scat0.shape[0]) if n_orders > 0 else None
    flux0 = jnp.zeros((2 * nxy + nxyz,), f32)
    vol0 = jnp.zeros((1,), f32)  # folded into flux0; kept for carry shape
    intensity0 = jnp.zeros((max(n_dirs, 1) * nxy,), f32)
    limit_intensity = compute_intensity and intensity_config.limit_contributions
    if limit_intensity:
        ibc0 = jnp.zeros(((ncomp + 1) * n_dirs * nxy,), f32)
        excess0 = jnp.zeros((n_dirs, ncomp + 1), f32)
    else:
        ibc0 = jnp.zeros((1,), f32)
        excess0 = jnp.zeros((1, 1), f32)
    carry0 = (state0, flux0, vol0, intensity0, ibc0, excess0, scat0,
              jnp.int32(0), jnp.int32(0), jnp.int32(0))

    def cond(carry):
        state = carry[0]
        step = carry[7]
        work = jnp.any(state["alive"] | (state["quota"] > 0))
        return work & (step < cfg.max_steps)

    def body(carry):
        (state, flux, vol, intensity, ibc, excess, scat, step, n_started,
         n_bad_acc) = carry
        order = state["order"]
        beta_loc = state["beta_loc"]
        x, y, z = state["x"], state["y"], state["z"]
        ux, uy, uz = state["ux"], state["uy"], state["uz"]
        w = state["w"]
        alive = state["alive"]
        quota = state["quota"]
        n = x.shape[0]  # body is lane-count polymorphic (tail compaction)

        def k(purpose):
            return rng.step_key(key, step, purpose)

        # ---------------- refill dead lanes from the source ----------------
        need = (~alive) & (quota > 0)
        xf, yf, zf, mu_s, phi_s = illumination.sample(source, k(rng.SOURCE), n)
        sx = x0 + xf * (x_max - x0)
        sy = y0 + yf * (y_max - y0)
        sz = jnp.clip(grid.z_from_fraction(zf), z0 + z_eps, z_max - z_eps)
        dx_, dy_, dz_ = make_direction_cosines(mu_s, phi_s)

        x = jnp.where(need, sx, x)
        y = jnp.where(need, sy, y)
        z = jnp.where(need, sz, z)
        ux = jnp.where(need, dx_, ux)
        uy = jnp.where(need, dy_, uy)
        uz = jnp.where(need, dz_, uz)
        w = jnp.where(need, 1.0, w)
        order = jnp.where(need, 0, order)
        # Fresh photons start with the global majorant (valid anywhere,
        # merely conservative); the first record gather localizes it.
        beta_loc = jnp.where(need, beta_max, beta_loc)
        alive = alive | need
        quota = quota - need.astype(jnp.int32)
        n_started = n_started + jnp.sum(need, dtype=jnp.int32)

        # LW emission pre-credit: emitted photons subtract 1 from the
        # absorbed-flux and volume-absorption tallies at the emitting cell
        # (flux-divergence accounting; reference:
        # Integrators/monteCarloRadiativeTransfer.f95:504-508).
        if cfg.lw_mode:
            atm_emit = need & (zf > 0)
            eix = grid.locate_x(x)
            eiy = grid.locate_y(y)
            eiz = grid.locate_z(z)
            ecol = eix * ny + eiy
            e_val = jnp.where(atm_emit, f32(-1.0), 0.0)
            flux = tally_add(
                flux, jnp.where(atm_emit, 2 * nxy + ecol * nz + eiz, 0), e_val)

            if compute_intensity:
                # Emission contributes to the radiances at photon birth:
                # isotropic 1/(4 pi |mu|) for atmospheric emission,
                # 1/pi for surface emission (reference:
                # Integrators/monteCarloRadiativeTransfer.f95:510-542,
                # 1688-1696).
                intensity, ibc, excess = accumulate_local_estimate(
                    intensity, domain, intensity_dirs, intensity_config,
                    mask=atm_emit, weight=w, x=x, y=y, z=z,
                    ux=ux, uy=uy, uz=uz, cell=(ecol * nz + eiz), comp=None,
                    kind="emission", key=k(rng.INTENSITY_RR),
                    by_component=ibc, excess=excess)
                sfc_emit = need & ~atm_emit
                intensity, ibc, excess = accumulate_local_estimate(
                    intensity, domain, intensity_dirs, intensity_config,
                    mask=sfc_emit, weight=w, x=x, y=y, z=z,
                    ux=ux, uy=uy, uz=uz, cell=ecol * nz, comp=None,
                    kind="surface", key=k(rng.INTENSITY_RR),
                    by_component=ibc, excess=excess)

        # ---------------- one transport step for all alive lanes ------------
        tau = rng.exponential_deviate(k(rng.TAU), (n,))
        if cfg.use_ray_tracing:
            # DDA ray tracing: march voxel-by-voxel until tau is accumulated
            # or a z boundary is hit (reference's first free-path mode;
            # reference: Integrators/monteCarloRadiativeTransfer.f95:555-563)
            r = dda.trace(domain, x, y, z, ux, uy, uz, alive, tau_stop=tau,
                          max_crossings=cfg.max_dda_crossings)
            bad = alive & (r["tau"] < 0)
            n_bad_acc = n_bad_acc + jnp.sum(bad, dtype=jnp.int32)
            exit_top = alive & r["exit_top"]
            exit_bot = alive & r["exit_bot"]
            collide = alive & r["stopped"] & ~bad
            xe = r["x"]
            ye = r["y"]
            col_e = r["ix"] * ny + r["iy"]
            xc = r["x"]
            yc = r["y"]
            zc = jnp.clip(r["z"], z0, z_max)
            ix = r["ix"]
            iy = r["iy"]
            iz = grid.locate_z(zc)
            col_c = ix * ny + iy
            cell = col_c * nz + iz
            rec = records[cell]
            real = collide  # ray tracing: every stop is a physical collision
            moved = collide
            alive = alive & ~bad
        else:
            # Maximum cross-section (Woodcock): one fused jump + null test.
            # With a macro majorant the jump uses the carried local ceiling
            # and is clipped at the macro-box face (a null step; the local
            # majorant is only valid within its block).
            if use_macro:
                # faces CLAMPED to the domain edge: with nx/ny/nz not
                # divisible by macro_factor the last partial block's
                # outer face is VIRTUAL (past the periodic seam); an
                # unclamped jump would cross the x/y wrap into a block
                # whose majorant can exceed the carried beta_loc
                # (systematic under-attenuation along the seam)
                lx_d, ly_d, lz_d = x_max - x0, y_max - y0, z_max - z0
                tx = (jnp.clip((jnp.floor((x - x0) / bx_w)
                                + (ux >= 0)) * bx_w, 0.0, lx_d) + x0 - x)
                ty = (jnp.clip((jnp.floor((y - y0) / by_w)
                                + (uy >= 0)) * by_w, 0.0, ly_d) + y0 - y)
                tz = (jnp.clip((jnp.floor((z - z0) / bz_w)
                                + (uz >= 0)) * bz_w, 0.0, lz_d) + z0 - z)
                tx = jnp.where(jnp.abs(ux) > 1e-12,
                               tx / jnp.where(ux == 0, 1.0, ux), 3e38)
                ty = jnp.where(jnp.abs(uy) > 1e-12,
                               ty / jnp.where(uy == 0, 1.0, uy), 3e38)
                tz = jnp.where(jnp.abs(uz) > 1e-12,
                               tz / jnp.where(uz == 0, 1.0, uz), 3e38)
                t_raw = jnp.minimum(tx, jnp.minimum(ty, tz))
                # A photon sitting exactly ON a block face heading outward
                # gets t_clip = 0 and sub-ulp nudge movement (zero progress,
                # and the carried majorant belongs to the wrong block).
                # Such lanes take one global-majorant step instead: always
                # a valid ceiling, guaranteed progress.
                escape = t_raw <= 0.0
                beta_loc = jnp.where(escape, beta_max, beta_loc)
                d_samp = jnp.where(beta_loc > 0, tau / beta_loc,
                                   jnp.float32(3e38))
                t_clip = jnp.where(escape, jnp.float32(3e38),
                                   t_raw + clip_nudge)
                clipped = t_clip < d_samp
                d = jnp.minimum(d_samp, t_clip)
            else:
                d = tau * inv_beta_max
                clipped = jnp.zeros((n,), bool)
            zn = z + uz * d

            exit_top = alive & (zn >= z_max)
            exit_bot = alive & ~exit_top & (zn <= z0)
            collide = alive & ~exit_top & ~exit_bot & ~clipped
            moved = alive & ~exit_top & ~exit_bot

            # Boundary-crossing point for exiting photons (backtrack along
            # the ray to the z boundary; reference:
            # Integrators/monteCarloRadiativeTransfer.f95:578-585,624-631)
            z_b = jnp.where(exit_top, z_max, z0)
            safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
            t_b = (z_b - z) / safe_uz
            xe = grid.wrap_x(x + ux * t_b)
            ye = grid.wrap_y(y + uy * t_b)
            ixe = grid.locate_x(xe)
            iye = grid.locate_y(ye)
            col_e = ixe * ny + iye

            # Collision cell
            xc = grid.wrap_x(x + ux * d)
            yc = grid.wrap_y(y + uy * d)
            zc = jnp.clip(zn, z0, z_max)
            ix = grid.locate_x(xc)
            iy = grid.locate_y(yc)
            iz = grid.locate_z(zc)
            col_c = ix * ny + iy
            cell = col_c * nz + iz

            # -- single packed record gather: everything a collision needs --
            rec = records[cell]  # [N, 2 + 4*ncomp]
            beta = rec[:, 0]
            u_col = rng.uniform(k(rng.COLLISION), (n,))
            # Null-collision test against the majorant this step sampled with
            ceiling = beta_loc if use_macro else beta_max
            real = collide & (u_col * ceiling < beta)
            if use_macro:
                # Carry the destination cell's local majorant to next step
                beta_loc = jnp.where(moved, rec[:, 1], beta_loc)

        # -------- component selection + absorption at real collisions -------
        if ncomp == 1:
            comp = jnp.zeros((n,), jnp.int32)
            ssa_c = rec[:, 3]
            pfi_c = rec[:, 4].astype(jnp.int32)
            g_c = rec[:, 5]
        else:
            cum = rec[:, 2:2 + ncomp]
            u_comp = rng.uniform(k(rng.COMPONENT), (n,))
            comp = jnp.sum(cum < u_comp[:, None], axis=1).astype(jnp.int32)
            comp = jnp.clip(comp, 0, ncomp - 1)
            comp_hot = jax.nn.one_hot(comp, ncomp, dtype=f32)
            ssa_c = jnp.sum(rec[:, 2 + ncomp:2 + 2 * ncomp] * comp_hot, axis=1)
            pfi_c = jnp.sum(rec[:, 2 + 2 * ncomp:2 + 3 * ncomp] * comp_hot,
                            axis=1).astype(jnp.int32)
            g_c = jnp.sum(rec[:, 2 + 3 * ncomp:2 + 4 * ncomp] * comp_hot, axis=1)

        absorbed = jnp.where(real, w * (1.0 - ssa_c), 0.0)
        w = jnp.where(real, w * ssa_c, w)
        # scattering order increments at each physical scattering event
        # (reference: Integrators/monteCarloRadiativeTransfer.f95:713)
        order = jnp.where(real, order + 1, order)

        # ---------------- local estimation (radiance) -----------------------
        if compute_intensity:
            # Scattering-event contribution with the post-absorption weight
            # (reference: Integrators/monteCarloRadiativeTransfer.f95:776-790)
            intensity, ibc, excess = accumulate_local_estimate(
                intensity, domain, intensity_dirs, intensity_config,
                mask=real, weight=w, x=xc, y=yc, z=zc,
                ux=ux, uy=uy, uz=uz, cell=cell, comp=comp,
                kind="scatter", key=k(rng.INTENSITY_RR),
                by_component=ibc, excess=excess, order=order)

        # ---------------- Russian roulette ---------------------------------
        if cfg.use_russian_roulette:
            u_rr = rng.uniform(k(rng.ROULETTE), (n,))
            play = real & (w < 0.5 * rr_w)
            survive = u_rr < w / rr_w
            w = jnp.where(play, jnp.where(survive, rr_w, 0.0), w)
        died_weight = real & (w <= _W_TINY)

        # ---------------- scattering: new direction -------------------------
        scatter = real & ~died_weight
        u_ang = rng.uniform(k(rng.SCAT_ANGLE), (n,))
        if domain.all_hg:
            cos_theta = sample_hg_cos(g_c, u_ang)
        else:
            row = offsets[comp] + pfi_c
            cos_theta = sample_scattering_cos(inv_flat, n_cdf_steps, row, u_ang)
        phi_rot = rng.uniform(k(rng.SCAT_AZIMUTH), (n,), 0.0, 2.0 * np.pi)
        rux, ruy, ruz = rotate_direction(ux, uy, uz, cos_theta, phi_rot)
        ux = jnp.where(scatter, rux, ux)
        uy = jnp.where(scatter, ruy, uy)
        uz = jnp.where(scatter, ruz, uz)

        # ---------------- surface reflection --------------------------------
        # Tally downward flux with the pre-reflection weight, then reflect
        # with mu = sqrt(u) and the surface reflectance (reference:
        # Integrators/monteCarloRadiativeTransfer.f95:619-702).
        w_down = w  # weight at the surface (pre-reflection)
        # A lane either scatters (real) or reflects at the surface
        # (exit_bot) in a given step, never both, so the surface draws can
        # reuse the scattering-angle/azimuth streams: per lane they serve
        # exactly one of the two mutually exclusive purposes. Saves two
        # uniform streams per step.
        mu_new = jnp.sqrt(jnp.maximum(u_ang, f32(1e-12)))
        phi_new = phi_rot
        if surface.is_uniform_lambertian:
            refl = surface.params[0, 0, 0]
        else:
            xfrac = (xe - x0) / (x_max - x0)
            yfrac = (ye - y0) / (y_max - y0)
            phi_in = jnp.arctan2(uy, ux)
            refl = surface.reflectance(xfrac, yfrac, uz, mu_new, phi_in, phi_new)
        w_refl = w_down * refl
        died_surface = exit_bot & (w_refl <= _W_TINY)
        reflected = exit_bot & ~died_surface

        sux, suy, suz = make_direction_cosines(mu_new, phi_new)
        x = jnp.where(exit_bot, xe, jnp.where(moved, xc, x))
        y = jnp.where(exit_bot, ye, jnp.where(moved, yc, y))
        z = jnp.where(exit_bot, z0 + z_eps, jnp.where(moved, zc, z))
        if use_macro:
            # Reflected photons restart at the surface with the (always
            # valid) global majorant; the next gather re-localizes it.
            beta_loc = jnp.where(exit_bot, beta_max, beta_loc)
        if compute_intensity:
            # incoming direction at the bounce (exit_bot lanes never
            # scatter this step, so ux/uy/uz still hold it here)
            in_dir_sfc = (ux, uy, uz)
        ux = jnp.where(reflected, sux, ux)
        uy = jnp.where(reflected, suy, uy)
        uz = jnp.where(reflected, suz, uz)
        w = jnp.where(reflected, w_refl, w)

        if compute_intensity:
            # Surface-reflection contribution (component 0; Lambertian
            # 1/pi, or the BRDF toward each detector direction for
            # non-Lambertian surfaces -- see accumulate_local_estimate;
            # reference:
            # Integrators/monteCarloRadiativeTransfer.f95:680-702,1688-1694)
            intensity, ibc, excess = accumulate_local_estimate(
                intensity, domain, intensity_dirs, intensity_config,
                mask=reflected, weight=w, x=x, y=y, z=z,
                ux=ux, uy=uy, uz=uz, cell=col_e * nz, comp=None,
                kind="surface", key=k(rng.INTENSITY_RR),
                by_component=ibc, excess=excess,
                surface=surface, in_dir=in_dir_sfc, weight_pre=w_down)

        alive = alive & ~exit_top & ~died_weight & ~died_surface

        # ---------------- fused tally accumulation ---------------------------
        # Each lane contributes at most one update per step (up | down |
        # absorption-at-cell are exclusive); absorbed pixel flux is derived
        # as the z-sum of volume absorption after the loop.
        f_idx = jnp.where(
            exit_top, col_e,
            jnp.where(exit_bot, nxy + col_e,
                      jnp.where(real, 2 * nxy + cell, 0)))
        f_val = jnp.where(exit_top, w,
                          jnp.where(exit_bot, w_down,
                                    jnp.where(real, absorbed, 0.0)))
        flux = tally_add(flux, f_idx, f_val)

        if n_orders > 0:
            # Boundary fluxes binned by scattering order (overflow in the
            # last bin). Exit lanes have not scattered this step, so
            # ``order`` is the order at the tally (the surface bounce below
            # increments afterwards, matching the reference's ordering).
            ob = jnp.minimum(order, n_orders)
            s_idx = jnp.where(
                exit_top, ob * nxy + col_e,
                jnp.where(exit_bot, (n_orders + 1 + ob) * nxy + col_e, 0))
            s_val = jnp.where(exit_top, w, jnp.where(exit_bot, w_down, 0.0))
            scat = scat_add(scat, s_idx, s_val)
        order = jnp.where(reflected, order + 1, order)

        new_state = dict(x=x, y=y, z=z, ux=ux, uy=uy, uz=uz, w=w,
                         alive=alive, quota=quota, order=order,
                         beta_loc=beta_loc)
        return (new_state, flux, vol, intensity, ibc, excess, scat, step + 1,
                n_started, n_bad_acc)

    # ---------------- two-phase execution with tail compaction ----------
    # The wave runs until the LAST lane dies; on long-tailed domains most
    # late steps process a nearly dead wave. Phase 1 stops once all quotas
    # are spent and few lanes survive; the survivors are compacted into a
    # 16x smaller wave and finished in phase 2 at proportionally lower
    # per-step cost.
    do_compact = cfg.tail_compaction and N >= 16384
    n_tail = max(N // 16, 2048)

    if do_compact:
        def cond1(carry):
            state = carry[0]
            step = carry[7]
            alive_n = jnp.sum(state["alive"], dtype=jnp.int32)
            has_quota = jnp.any(state["quota"] > 0)
            work = has_quota | (alive_n > 0)
            small_tail = (~has_quota) & (alive_n <= n_tail)
            return work & (step < cfg.max_steps) & ~small_tail

        carry1 = jax.lax.while_loop(cond1, body, carry0)
        state1 = carry1[0]
        alive1 = state1["alive"]
        alive_n1 = jnp.sum(alive1, dtype=jnp.int32)
        sel = jnp.nonzero(alive1, size=n_tail, fill_value=0)[0]
        valid = jnp.arange(n_tail) < alive_n1
        state2 = {k2: v[sel] for k2, v in state1.items()}
        state2["alive"] = state2["alive"] & valid
        state2["quota"] = jnp.zeros((n_tail,), jnp.int32)
        # Phase 1 normally exits with <= n_tail survivors, but a max_steps
        # exit can leave more; those beyond n_tail are dropped here and must
        # be counted in the bad-photon diagnostic (tallies are unaffected).
        n_dropped = jnp.maximum(alive_n1 - n_tail, 0)
        carry2 = (state2,) + carry1[1:9] + (carry1[9] + n_dropped,)
        final = jax.lax.while_loop(cond, body, carry2)
    else:
        final = jax.lax.while_loop(cond, body, carry0)

    (state_f, flux_f, vol_f, intensity_f, ibc_f, excess_f, scat_f, n_steps,
     n_started, n_bad_dda) = final
    n_bad = jnp.sum(state_f["alive"], dtype=jnp.int32) + n_bad_dda

    if limit_intensity:
        # Redistribute capped excess across the image (reference:
        # Integrators/monteCarloRadiativeTransfer.f95:294-322)
        intensity_f = redistribute_excess(intensity_f, ibc_f, excess_f,
                                          n_dirs, nxy)

    if debug_state:
        return state_f

    if n_orders > 0:
        by_order = scat_f.reshape(2, n_orders + 1, nx, ny)
        up_by_order = by_order[0].transpose(1, 2, 0)
        down_by_order = by_order[1].transpose(1, 2, 0)
    else:
        up_by_order = down_by_order = None

    volume_absorption = flux_f[2 * nxy:].reshape(nx, ny, nz)
    return Tallies(
        flux_up=flux_f[:nxy].reshape(nx, ny),
        flux_down=flux_f[nxy:2 * nxy].reshape(nx, ny),
        flux_absorbed=jnp.sum(volume_absorption, axis=2),
        volume_absorption=volume_absorption,
        intensity=(intensity_f.reshape(n_dirs, nx, ny).transpose(1, 2, 0)
                   if compute_intensity else None),
        flux_up_by_order=up_by_order,
        flux_down_by_order=down_by_order,
        n_photons=n_started,
        n_bad=n_bad,
        n_steps=n_steps,
    )


class Integrator:
    """Convenience wrapper: holds (domain, surface, config) and runs batches.

    Role-equivalent of the reference's ``integrator`` object + its
    new_Integrator/specifyParameters/computeRadiativeTransfer surface
    (reference: Integrators/monteCarloRadiativeTransfer.f95:121-123).
    """

    def __init__(self, domain: OpticalDomain, surface: Surface,
                 config: KernelConfig = KernelConfig(),
                 intensity_config: Optional[IntensityConfig] = None,
                 intensity_dirs: Optional[jax.Array] = None):
        self.domain = domain
        self.surface = surface
        self.config = config
        self.intensity_config = intensity_config
        self.intensity_dirs = intensity_dirs

    def compute(self, source: illumination.Source, seed: int,
                batch_index: int = 0, normalize: bool = True) -> Tallies:
        """Run one batch and (optionally) normalize per column."""
        key = rng.batch_key(seed, batch_index)
        t = run_batch(self.domain, self.surface, source, key, self.config,
                      self.intensity_config, self.intensity_dirs)
        return t.normalized(self.domain.grid) if normalize else t
