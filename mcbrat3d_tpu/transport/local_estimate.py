"""Local estimation of top-of-domain radiances.

Re-design of ``computeIntensityContribution`` (reference:
Integrators/monteCarloRadiativeTransfer.f95:1623-1832). At every scattering
/ reflection / emission event, each radiance direction receives

    contribution = w * Pn(theta_d) * exp(-tau_d)

where Pn is the normalized phase value (P/(4 pi |mu_d|); 1/pi for surface
reflection; 1/(4 pi |mu_d|) for isotropic emission) and tau_d is the optical
depth from the event to the top of the domain along direction d. The
contribution is tallied at the pixel where the ray *exits* the top.

TPU shape: directions iterate in a ``fori_loop`` (compiled once) while the
DDA transmittance marcher runs wave-parallel over all event lanes. The
Iwabuchi (2006) Russian-roulette variant bounds the marching work per event
(reference: Integrators/monteCarloRadiativeTransfer.f95:1753-1813).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mcbrat3d_tpu.transport import dda


@dataclasses.dataclass(frozen=True)
class IntensityConfig:
    """Static knobs for radiance computation (subset of the reference's
    `algorithms` namelist; reference: Drivers/monteCarloDriver.f95:110-118)."""

    n_dirs: int
    use_russian_roulette: bool = True
    zeta_min: float = 0.3  # Iwabuchi zetaMin
    use_hybrid_phase: bool = True
    n_orders_orig_phase: int = 0  # use original phase funcs for first k orders
    # Contribution capping: large local-estimate spikes are clipped at
    # max_contribution and the clipped excess is redistributed across the
    # image after the batch, proportionally to each (direction, component)'s
    # accumulated intensity (reference:
    # Integrators/monteCarloRadiativeTransfer.f95:1815-1826 capping,
    # :294-322 redistribution).
    limit_contributions: bool = False
    max_contribution: float = 77.0
    # Megakernel local estimation sizes its static DDA-march bound from
    # this floor: every direction's mu must be >= pallas_min_mu (or <= 0,
    # which contributes zero TOA radiance) for the in-kernel path to be
    # exact. Shallower upward directions fall back to the XLA path by
    # lowering this value (longer marches) or are handled there anyway
    # when other eligibility conditions fail.
    pallas_min_mu: float = 0.15
    # Megakernel march formulation: "auto" (default) picks PER DIRECTION
    # between "colct" (per-column cumulative-tau tables, one gather per
    # COLUMN crossing -- exact, few but costlier iterations; wins for
    # steep directions) and "cell" (per-cell-face DDA -- cheap per
    # iteration; wins for shallow directions) using a crossing-count x
    # per-iteration cost model on the concrete direction cosines. See
    # transport.pallas_kernel.PallasConfig.march_mode/march_dirs.
    pallas_march: str = "auto"


def make_intensity_directions(mus, phis_deg) -> jax.Array:
    """[3, ndir] unit direction cosines for the radiance detectors.

    mus > 0 look up through the top of the domain (the reference requires
    nonzero mu; reference: Drivers/monteCarloDriver.f95:242-277).
    """
    mus = np.asarray(mus, np.float64).ravel()
    phis = np.deg2rad(np.asarray(phis_deg, np.float64).ravel())
    if mus.shape != phis.shape:
        raise ValueError("mus and phis must have equal length")
    if np.any(mus == 0.0):
        raise ValueError("radiance directions must have nonzero mu")
    sin_t = np.sqrt(1.0 - mus**2)
    dirs = np.stack([sin_t * np.cos(phis), sin_t * np.sin(phis), mus])
    return jnp.asarray(dirs, jnp.float32)


def _phase_value(domain, cell, comp, cos_scat, orig: bool):
    """Interpolate the tabulated (hybrid or original) forward phase function
    at the event's scattering cosine (reference:
    lookUpPhaseFuncValsFromTable,
    Integrators/monteCarloRadiativeTransfer.f95:1834-1873)."""
    table = domain.tables.forward_orig if orig else domain.tables.forward
    n_angles = table.shape[1]
    if n_angles == 1 and domain.all_hg:
        # All-HG domain without tabulated forward tables: evaluate the
        # Henyey-Greenstein phase function analytically from the cell
        # record's per-component asymmetry (the megakernel does the same;
        # tabulation is only required for non-HG entries).
        nc = domain.n_components
        g = domain.cell_records[cell, 2 + 3 * nc + comp]
        c = jnp.clip(cos_scat, -1.0, 1.0)
        return (1.0 - g * g) * (1.0 + g * g - 2.0 * g * c) ** -1.5
    flat = table.reshape(-1)
    ncomp = domain.n_components
    pfi = domain.phase_index.reshape(-1)[cell * ncomp + comp]
    row = domain.tables.offsets[comp] + pfi
    theta = jnp.arccos(jnp.clip(cos_scat, -1.0, 1.0))
    t = theta * ((n_angles - 1) / np.pi)
    k = jnp.clip(t.astype(jnp.int32), 0, n_angles - 2)
    frac = t - k.astype(jnp.float32)
    base = row * n_angles + k
    return (1.0 - frac) * flat[base] + frac * flat[base + 1]


def accumulate_local_estimate(intensity, domain, dirs, icfg: IntensityConfig,
                              mask, weight, x, y, z, ux, uy, uz,
                              cell, comp, kind: str, key,
                              by_component=None, excess=None, order=None,
                              surface=None, in_dir=None, weight_pre=None):
    """Add this event wave's contributions into the flat intensity buffer.

    ``intensity``: flat [n_dirs * nx * ny] f32 buffer.
    ``kind``: 'scatter' | 'surface' | 'emission'.
    With ``icfg.limit_contributions``: ``by_component`` is a flat
    [(ncomp+1) * n_dirs * nx * ny] buffer (slot 0 = surface/emission,
    matching the reference's component-0 attribution) and ``excess`` is
    [n_dirs, ncomp+1]; returns (intensity, by_component, excess).

    Non-Lambertian surfaces: pass ``surface``, the INCOMING direction
    ``in_dir`` = (ux, uy, uz) at the bounce, and the PRE-reflection
    ``weight_pre``; the surface term then evaluates the BRDF toward
    each detector direction, Rf(in -> d)/pi, instead of reusing the
    weight sampled for the bounce direction (which would apply the BRDF
    of the WRONG outgoing direction and miss the hotspot/anisotropy).
    For a Lambertian surface both forms are identical
    (w_down * albedo / pi). Fills the reference's open BRDF extension
    point (reference: src/surfaceProperties.f95:119-147; its own local
    estimate is Lambertian-only,
    Integrators/monteCarloRadiativeTransfer.f95:1688-1694).
    """
    grid = domain.grid
    nx, ny, _ = grid.shape
    nxy = nx * ny
    n_dirs = icfg.n_dirs
    limit = icfg.limit_contributions
    ncomp1 = domain.n_components + 1
    if kind == "scatter":
        comp_slot = comp + 1
    else:
        comp_slot = jnp.zeros_like(cell)

    def per_direction(d, carry):
        if limit:
            acc, ibc, exc = carry
        else:
            acc = carry
        dir_d = jax.lax.dynamic_slice(dirs, (0, d), (3, 1))[:, 0]
        mu_d = dir_d[2]

        wgt = weight
        if kind == "surface":
            if surface is not None and not surface.is_uniform_lambertian:
                phi_out = jnp.arctan2(dir_d[1], dir_d[0])
                phi_in = jnp.arctan2(in_dir[1], in_dir[0])
                xe0, xe1 = grid.x_edges[0], grid.x_edges[-1]
                ye0, ye1 = grid.y_edges[0], grid.y_edges[-1]
                rf = surface.reflectance(
                    (x - xe0) / (xe1 - xe0), (y - ye0) / (ye1 - ye0),
                    in_dir[2], jnp.abs(mu_d), phi_in,
                    jnp.broadcast_to(phi_out, x.shape))
                npf = rf * np.float32(1.0 / np.pi)
                wgt = weight_pre
            else:
                npf = jnp.full_like(weight, 1.0 / np.pi)
        elif kind == "emission":
            npf = 1.0 / (4.0 * np.pi * jnp.abs(mu_d)) * jnp.ones_like(weight)
        else:
            cos_scat = ux * dir_d[0] + uy * dir_d[1] + uz * dir_d[2]
            pv = _phase_value(domain, cell, comp, cos_scat,
                              orig=not icfg.use_hybrid_phase)
            if (icfg.use_hybrid_phase and icfg.n_orders_orig_phase > 0
                    and order is not None):
                # First k scattering orders use the original (non-hybrid)
                # phase function (reference:
                # Integrators/monteCarloRadiativeTransfer.f95:1713-1725)
                pv_orig = _phase_value(domain, cell, comp, cos_scat,
                                       orig=True)
                pv = jnp.where(order <= icfg.n_orders_orig_phase,
                               pv_orig, pv)
            npf = pv / (4.0 * np.pi * jnp.abs(mu_d))

        dx = jnp.broadcast_to(dir_d[0], x.shape)
        dy = jnp.broadcast_to(dir_d[1], x.shape)
        dz = jnp.broadcast_to(dir_d[2], x.shape)

        if not icfg.use_russian_roulette:
            r = dda.trace(domain, x, y, z, dx, dy, dz, mask)
            ok = r["exit_top"] & (r["tau"] >= 0)
            contrib = jnp.where(ok, wgt * npf * jnp.exp(-r["tau"]), 0.0)
            col = r["ix"] * ny + r["iy"]
        else:
            # Iwabuchi 2006 Eqs 13-14 (reference:
            # Integrators/monteCarloRadiativeTransfer.f95:1753-1813)
            kk = jax.random.fold_in(key, d)
            u1 = jax.random.uniform(kk, x.shape, dtype=jnp.float32)
            tau_free = -jnp.log(1.0 - jax.random.uniform(
                jax.random.fold_in(kk, 1), x.shape, dtype=jnp.float32))
            npf_pi = np.pi * npf
            zeta = jnp.float32(icfg.zeta_min)
            small = npf_pi <= zeta

            # Branch A (small contribution): march only to tau_free; accept
            # with probability npf_pi/zeta if the ray escapes.
            # Branch B: march to tau_max = -log(zeta/npf_pi); full
            # contribution if escaped, else roulette continuation to
            # tau_free.
            tau_max = -jnp.log(zeta / jnp.maximum(npf_pi, 1e-30))
            tau_cap = jnp.where(small, tau_free, tau_max)
            r = dda.trace(domain, x, y, z, dx, dy, dz, mask, tau_stop=tau_cap)
            escaped = r["exit_top"] & (r["tau"] >= 0)

            contrib_a = jnp.where(escaped & (u1 <= npf_pi / zeta),
                                  wgt * zeta / np.pi, 0.0)

            contrib_b_full = jnp.where(escaped, wgt * npf * jnp.exp(-r["tau"]), 0.0)
            # Continuation for branch B lanes that hit tau_max inside the domain
            cont = mask & ~small & r["stopped"]
            r2 = dda.trace(domain, r["x"], r["y"], r["z"], dx, dy, dz, cont,
                           tau_stop=tau_free)
            contrib_b_rr = jnp.where(cont & r2["exit_top"],
                                     wgt * zeta / np.pi, 0.0)
            contrib = jnp.where(small, contrib_a, contrib_b_full + contrib_b_rr)
            col = jnp.where(cont, r2["ix"] * ny + r2["iy"],
                            r["ix"] * ny + r["iy"])

        if limit:
            cap = jnp.float32(icfg.max_contribution)
            over = jnp.where(mask, jnp.maximum(contrib - cap, 0.0), 0.0)
            contrib = jnp.minimum(contrib, cap)
            exc = exc.at[d, jnp.where(mask, comp_slot, 0)].add(over)

        idx = jnp.where(mask & (contrib > 0), d * nxy + col, 0)
        val = jnp.where(mask, contrib, 0.0)
        acc = acc.at[idx].add(val)
        if limit:
            ibc_idx = jnp.where(mask & (contrib > 0),
                                (comp_slot * n_dirs + d) * nxy + col, 0)
            ibc = ibc.at[ibc_idx].add(val)
            return (acc, ibc, exc)
        return acc

    if limit:
        return jax.lax.fori_loop(0, n_dirs, per_direction,
                                 (intensity, by_component, excess))
    out = jax.lax.fori_loop(0, n_dirs, per_direction, intensity)
    return (out, by_component, excess)


def redistribute_excess(intensity, by_component, excess, n_dirs, nxy):
    """Spread capped excess across the image, proportionally to each
    (direction, component)'s accumulated intensity pattern (reference:
    Integrators/monteCarloRadiativeTransfer.f95:294-322)."""
    ncomp1 = by_component.shape[0] // (n_dirs * nxy)
    ibc = by_component.reshape(ncomp1, n_dirs, nxy)
    sums = jnp.sum(ibc, axis=2)  # [ncomp1, n_dirs]
    weightings = ibc / jnp.maximum(sums[:, :, None], 1e-30)
    add = jnp.einsum("cdp,dc->dp", weightings, excess)
    return intensity + add.reshape(-1)
