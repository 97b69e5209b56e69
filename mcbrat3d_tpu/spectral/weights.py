"""Spectral and emission weighting.

Re-implementation of the reference's emissionAndBBWeights module
(reference: src/emissionAndBroadBandWeights.f95): the spectral power CDF
for solar (SW) and thermal (LW) sources, the per-voxel emission CDF, and
the multinomial photon distribution over wavelength bins. All setup-time
float64 NumPy with compensated sums.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mcbrat3d_tpu.core.accumulate import kahan_cumsum
from mcbrat3d_tpu.core.planck import planck_radiance


def lambda_widths(lambdas: np.ndarray) -> np.ndarray:
    """Per-bin spectral width: first/last use the adjacent gap, interior
    bins the half-point span (reference:
    src/emissionAndBroadBandWeights.f95:168-184)."""
    lam = np.asarray(lambdas, np.float64)
    if lam.size == 1:
        return np.ones(1)
    d = np.empty_like(lam)
    d[0] = abs(lam[1] - lam[0])
    d[-1] = abs(lam[-1] - lam[-2])
    if lam.size > 2:
        d[1:-1] = np.abs((lam[2:] - lam[:-2]) / 2.0)
    return d


def solar_weighting(lambdas, source_function, solar_mu, srf=None):
    """Spectral power CDF for a solar source.

    Kahan-summed integral of dLambda * |mu0| * S(lambda) (* SRF); returns
    (cdf [nLambda], total_flux) (reference:
    src/emissionAndBroadBandWeights.f95:149-217).
    """
    lam = np.asarray(lambdas, np.float64)
    s = np.asarray(source_function, np.float64)
    d = lambda_widths(lam)
    terms = d * abs(solar_mu) * s
    if srf is not None:
        terms = terms * np.asarray(srf, np.float64)
    cdf = kahan_cumsum(terms)
    total = float(cdf[-1])
    return cdf / total, total


@dataclasses.dataclass
class EmissionWeights:
    """Per-wavelength thermal emission weighting.

    ``voxel_cdf``: flattened (z-outer, y, x-inner) normalized cumulative
    power, ready for the emission photon source's single-deviate bisection.
    """

    voxel_cdf: np.ndarray  # [nz*ny*nx]
    frac_atms_power: float
    flux: float  # domain-mean monochromatic flux [W m^-2 um^-1]
    total_flux: float  # flux * dLambda [W m^-2] (0 if dLambda not given)


def emission_weighting(grid, temps, absorption_coeff, surface_temp,
                       surface_emissivity, lambda_um,
                       d_lambda=None) -> EmissionWeights:
    """Per-voxel Planck emission CDF + surface/atmosphere power split.

    contribution(cell) = 4 pi B_lambda(T) kappa_abs dz  [W m^-2 um^-1]
    surface power = pi e B_lambda(Tsfc) * area
    (reference: emission_weightingNEW,
    src/emissionAndBroadBandWeights.f95:424-550).

    ``absorption_coeff``: [nx, ny, nz] volume absorption coefficient
    [km^-1] = totalExt - sum_c ssa_c ext_c.
    """
    nx, ny, nz = grid.shape
    temps = np.asarray(temps, np.float64)
    kabs = np.asarray(absorption_coeff, np.float64)
    xe = np.asarray(grid.x_edges, np.float64)
    ye = np.asarray(grid.y_edges, np.float64)
    ze = np.asarray(grid.z_edges, np.float64)
    dz = np.diff(ze)
    area_m2 = (xe[-1] - xe[0]) * (ye[-1] - ye[0]) * 1000.0**2

    # surface power [W]
    if surface_emissivity <= 0.0 or surface_temp <= 0.0:
        sfc_power = 0.0
    else:
        b_sfc = planck_radiance(lambda_um, surface_temp)
        sfc_power = np.pi * surface_emissivity * b_sfc * area_m2

    # per-voxel emitted power density, accumulated in the reference's
    # (z outer, y, x inner) scan order
    if np.all(temps > 0.0):
        b_atm = planck_radiance(lambda_um, temps)  # [nx,ny,nz]
        contrib = 4.0 * np.pi * b_atm * kabs * dz[None, None, :]
        flat = contrib.transpose(2, 1, 0).reshape(-1)  # (z,y,x) order
        run = kahan_cumsum(flat)
    else:
        run = np.zeros(nx * ny * nz)

    atms_total = float(run[-1]) if run.size else 0.0
    if atms_total > 0.0:
        atms_power = atms_total * area_m2 / (nx * ny)
        voxel_cdf = run / atms_total
        voxel_cdf[-1] = 1.0
    else:
        atms_power = 0.0
        voxel_cdf = np.ones(nx * ny * nz)

    total_power = atms_power + sfc_power
    frac_atms = atms_power / total_power if total_power > 0 else 0.0
    flux = total_power / area_m2
    total_flux = flux * float(d_lambda) if d_lambda is not None else 0.0
    return EmissionWeights(voxel_cdf=voxel_cdf, frac_atms_power=frac_atms,
                           flux=flux, total_flux=total_flux)


def absorption_coefficient(components, grid):
    """kappa_abs = totalExt - sum_c ssa_c ext_c over flattened components
    (reference: src/emissionAndBroadBandWeights.f95:504)."""
    nx, ny, nz = grid.shape
    kabs = np.zeros((nx, ny, nz), np.float64)
    for comp in components:
        e = comp.extinction
        a = comp.single_scattering_albedo
        if comp.is_horizontally_uniform:
            e = np.broadcast_to(e, (nx, ny, e.shape[2]))
            a = np.broadcast_to(a, (nx, ny, a.shape[2]))
        z0 = comp.z_level_base
        kabs[:, :, z0:z0 + e.shape[2]] += e * (1.0 - a)
    return kabs


def frequency_distribution(cdf, total_photons, seed):
    """Photon counts per wavelength bin: multinomial draw against the
    spectral CDF (reference: getFrequencyDistr,
    src/emissionAndBroadBandWeights.f95:552-596). Deterministic in seed."""
    cdf = np.asarray(cdf, np.float64)
    probs = np.diff(np.concatenate(([0.0], cdf)))
    probs = np.maximum(probs, 0.0)
    probs = probs / probs.sum()
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.multinomial(int(total_photons), probs).astype(np.int64)
