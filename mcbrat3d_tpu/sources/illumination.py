"""Photon sources.

Re-design of the reference's photonStream constructors (reference:
src/monteCarloIllumination.f95:62-522). The reference precomputes arrays of
photon positions/directions on the host and iterates; on TPU the transport
kernel instead *samples the source on the fly* whenever a lane finishes its
current photon (persistent-threads refill), so a Source is a small pytree of
parameters plus a vectorized ``sample`` routine. Statistics are identical;
storage is O(1) instead of O(n_photons).

Source kinds (matching the reference's constructor overloads):
  * directional   -- solar beam: fixed (mu0, phi0), random (x, y), top of domain
  * random_azimuth-- fixed mu0, random azimuth
  * flux          -- mu = -sqrt(u): global-average flux weighting
  * spotlight     -- fixed direction and position
  * emission      -- LW/broadband thermal emission from atmosphere + surface
                     (BBEmission; reference: src/monteCarloIllumination.f95:431-522)

All samples are returned in *fractional* coordinates (x, y, z in [0, 1]) the
way the reference's photonStream stores them; the kernel maps them to domain
coordinates (reference: Integrators/monteCarloRadiativeTransfer.f95:480-494).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

DIRECTIONAL = "directional"
RANDOM_AZIMUTH = "random_azimuth"
FLUX = "flux"
SPOTLIGHT = "spotlight"
EMISSION = "emission"

_TOP = np.float32(1.0 - 2.0 ** -23)  # z fraction just below the domain top
_MIN_MU = np.float32(1e-6)  # guard against horizontally trapped photons


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Source:
    """Photon source parameters. ``kind`` is static (one compile per kind)."""

    kind: str = dataclasses.field(metadata=dict(static=True))
    solar_mu: jax.Array = None  # |mu0|; photons travel with mu = -|mu0|
    solar_azimuth: jax.Array = None  # radians
    solar_x: jax.Array = None  # spotlight fractional position
    solar_y: jax.Array = None
    # Emission-source fields (thermal): flattened voxel power CDF over
    # [nz, ny, nx] (C-order, z outermost -- matching the reference's
    # level/col/voxel nested CDF scan order), and the fraction of total
    # power emitted by the atmosphere (vs the surface).
    voxel_cdf: jax.Array = None
    atms_fraction: jax.Array = None
    grid_shape: tuple = dataclasses.field(metadata=dict(static=True), default=None)
    # Walker alias table of the voxel emission distribution in KERNEL cell
    # order ((ix*ny + iy)*nz + iz), built eagerly from the (concrete) CDF
    # at source construction. The TPU megakernel samples the emission
    # voxel in O(1): one uniform picks bin j, a second accepts j with
    # probability em_prob[j] or takes em_alias[j] -- one table gather per
    # refill instead of a CDF bisection (TPU-first replacement for the
    # reference's 3-level CDF scan; reference:
    # src/monteCarloIllumination.f95:495-498). None when the CDF was
    # traced (then only the XLA searchsorted path is available).
    em_prob: jax.Array = None
    em_alias: jax.Array = None
    # [n_vox, 2] stack of (em_prob, em_alias) so the XLA sampling path
    # fetches both with ONE row gather (HBM gathers cost per row index).
    em_packed: jax.Array = None
    # Emission backed by the domain's separable tables (sep_em_*) instead
    # of a per-voxel alias: no voxel CDF or alias arrays exist; only the
    # separable megakernel can sample this source.
    em_sep: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)


def directional(solar_mu: float, solar_azimuth_deg: float) -> Source:
    """Solar beam (reference: src/monteCarloIllumination.f95:62-101)."""
    if abs(solar_mu) > 1.0 or abs(solar_mu) < 1e-30:
        raise ValueError("solar_mu out of bounds")
    if not 0.0 <= solar_azimuth_deg <= 360.0:
        raise ValueError("solar azimuth out of bounds")
    return Source(kind=DIRECTIONAL,
                  solar_mu=jnp.float32(abs(solar_mu)),
                  solar_azimuth=jnp.float32(np.deg2rad(solar_azimuth_deg)))


def random_azimuth(solar_mu: float) -> Source:
    if abs(solar_mu) > 1.0 or abs(solar_mu) < 1e-30:
        raise ValueError("solar_mu out of bounds")
    return Source(kind=RANDOM_AZIMUTH, solar_mu=jnp.float32(abs(solar_mu)))


def flux() -> Source:
    return Source(kind=FLUX)


def spotlight(solar_mu: float, solar_azimuth_deg: float,
              solar_x: float, solar_y: float) -> Source:
    if not (0.0 < solar_x <= 1.0 and 0.0 < solar_y <= 1.0):
        raise ValueError("spotlight x/y must be in (0, 1]")
    return Source(kind=SPOTLIGHT,
                  solar_mu=jnp.float32(abs(solar_mu)),
                  solar_azimuth=jnp.float32(np.deg2rad(solar_azimuth_deg)),
                  solar_x=jnp.float32(solar_x), solar_y=jnp.float32(solar_y))


def emission(voxel_cdf, atms_fraction, grid_shape) -> Source:
    """Thermal emission source.

    ``voxel_cdf``: [nz*ny*nx] cumulative power fractions (last entry 1.0),
    C-ordered as [nz, ny, nx]. ``atms_fraction``: probability that a photon
    is emitted by the atmosphere rather than the surface (fracAtmsPower;
    reference: src/monteCarloIllumination.f95:457-522).
    """
    nx, ny, nz = grid_shape
    em_prob = em_alias = None
    if not isinstance(voxel_cdf, jax.core.Tracer):
        cdf = np.asarray(voxel_cdf, np.float64)
        p = np.diff(cdf, prepend=0.0)
        p = np.maximum(p, 0.0)
        s = p.sum()
        p = p / s if s > 0 else np.full_like(p, 1.0 / p.size)
        # reorder [nz, ny, nx] C-order -> kernel order (ix*ny + iy)*nz + iz
        pk = p.reshape(nz, ny, nx).transpose(2, 1, 0).reshape(-1)
        prob, alias = _walker_alias(pk)
        em_prob = jnp.asarray(prob, jnp.float32)
        em_alias = jnp.asarray(alias, jnp.float32)  # f32-exact (< 2^24)
        em_packed = jnp.stack([em_prob, em_alias], axis=1)  # one gather
    else:
        em_packed = None
    return Source(kind=EMISSION,
                  voxel_cdf=jnp.asarray(voxel_cdf, jnp.float32),
                  atms_fraction=jnp.float32(atms_fraction),
                  grid_shape=(int(nx), int(ny), int(nz)),
                  em_prob=em_prob, em_alias=em_alias,
                  em_packed=em_packed)


def emission_separable(domain, surface_temp: float,
                       surface_emissivity: float) -> Source:
    """Thermal emission source backed by the domain's separable tables.

    Skips emission_weighting's full per-voxel Planck CDF (a 15.8M-voxel
    Kahan scan per wavelength bin at flagship scale) and the per-voxel
    Walker alias upload: the separable megakernel samples the emission
    voxel from domain.sep_em_* directly, so the source only needs the
    atmosphere/surface power split. That split is exact in the factorized
    form (domain.sep_em_atm, built host-side in build_domain):
      frac = atm / (atm + pi * emissivity * B(Tsfc))
    (fracAtmsPower; reference: src/monteCarloIllumination.f95:457-522).

    Requires a domain built with temps + lambda_um (sep_em_prob present).
    Usable ONLY with the separable megakernel (transport/pallas_sep.py).
    """
    from mcbrat3d_tpu.core.planck import planck_radiance

    if getattr(domain, "sep_em_prob", None) is None:
        raise ValueError(
            "emission_separable needs a separable domain built with "
            "temps and lambda_um (domain.sep_em_prob is None)")
    nx, ny, nz = domain.grid.shape
    # per-column mean, matching emission_weighting's
    # atms_power = atms_total * area / (nx*ny) vs pi*e*B*area
    atm = float(getattr(domain, "sep_em_atm", 0.0)) / (nx * ny)
    if surface_emissivity > 0.0 and surface_temp > 0.0:
        sfc = np.pi * surface_emissivity * planck_radiance(
            float(domain.lambda_um), float(surface_temp))
    else:
        sfc = 0.0
    tot = atm + sfc
    frac = atm / tot if tot > 0.0 else 0.0
    return Source(kind=EMISSION,
                  atms_fraction=jnp.float32(frac),
                  grid_shape=(int(nx), int(ny), int(nz)),
                  em_sep=True)


def _load_alias_native():
    """Build/load native/libalias.so (Vose is sequential: Python loops over
    the flagship's 15.8M voxels take minutes; the C++ loop takes ~0.1 s).
    Returns the ctypes function or None (Python fallback)."""
    import ctypes
    import os
    import subprocess

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native", "alias.cpp")
    lib_path = os.path.join(os.path.dirname(src), "libalias.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-march=native", "-shared",
                            "-fPIC", src, "-o", lib_path], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.walker_alias.restype = ctypes.c_int
        lib.walker_alias.argtypes = [
            ctypes.c_longlong, np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64)]
        return lib.walker_alias
    except Exception:
        return None


_ALIAS_NATIVE = None
_ALIAS_NATIVE_TRIED = False


def _walker_alias(p: np.ndarray):
    """Vose's O(n) alias-table construction for the distribution ``p``.

    Returns (prob, alias): sample j ~ Uniform{0..n-1}, accept j with
    probability prob[j], else take alias[j]; the result is distributed
    exactly as p (up to f64 rounding). Uses native/alias.cpp when
    available (the construction is sequential and runs per wavelength bin
    over up to ~16M voxels on production LW domains).
    """
    global _ALIAS_NATIVE, _ALIAS_NATIVE_TRIED
    n = p.size
    if not _ALIAS_NATIVE_TRIED:
        _ALIAS_NATIVE = _load_alias_native()
        _ALIAS_NATIVE_TRIED = True
    if _ALIAS_NATIVE is not None:
        p64 = np.ascontiguousarray(p, np.float64)
        prob = np.zeros(n, np.float64)
        alias = np.zeros(n, np.int64)
        if _ALIAS_NATIVE(n, p64, prob, alias) == 0:
            return prob, alias
    prob = np.zeros(n, np.float64)
    alias = np.arange(n, dtype=np.int64)
    scaled = p.astype(np.float64) * n
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s_i = small.pop()
        l_i = large.pop()
        prob[s_i] = scaled[s_i]
        alias[s_i] = l_i
        scaled[l_i] = (scaled[l_i] + scaled[s_i]) - 1.0
        (small if scaled[l_i] < 1.0 else large).append(l_i)
    for i in large:
        prob[i] = 1.0
    for i in small:  # numerical leftovers
        prob[i] = 1.0
    return prob, alias


def sample(source: Source, key: jax.Array, n: int):
    """Draw ``n`` photons: fractional (x, y, z), direction (mu, phi).

    Draw count varies by kind (uniforms cost per stream on TPU); streams are
    derived per field index so adding kinds never perturbs existing ones.
    """
    def u(i):
        return jax.random.uniform(jax.random.fold_in(key, i), (n,),
                                  dtype=jnp.float32)

    if source.kind == DIRECTIONAL:
        return (u(0), u(1), jnp.full((n,), _TOP),
                jnp.full((n,), -source.solar_mu),
                jnp.full((n,), source.solar_azimuth))
    if source.kind == RANDOM_AZIMUTH:
        return (u(0), u(1), jnp.full((n,), _TOP),
                jnp.full((n,), -source.solar_mu),
                2.0 * jnp.pi * u(2))
    if source.kind == FLUX:
        # mu = -sqrt(u): daytime-average weighting
        # (reference: src/monteCarloIllumination.f95:142-176)
        return (u(0), u(1), jnp.full((n,), _TOP),
                -jnp.sqrt(jnp.maximum(u(2), 1e-12)),
                2.0 * jnp.pi * u(3))
    if source.kind == SPOTLIGHT:
        return (jnp.full((n,), source.solar_x), jnp.full((n,), source.solar_y),
                jnp.full((n,), _TOP),
                jnp.full((n,), -source.solar_mu),
                jnp.full((n,), source.solar_azimuth))
    if source.kind == EMISSION:
        return _sample_emission(source, [u(i) for i in range(7)], n, key)
    raise ValueError(f"unknown source kind {source.kind!r}")


def _sample_emission(source: Source, u, n: int, key=None):
    """BBEmission: atmosphere-vs-surface split, voxel sampling, uniform
    position within the voxel, isotropic (atm) / Lambertian-up (surface)
    directions (reference: src/monteCarloIllumination.f95:431-522).

    Voxel sampling uses the Walker alias table when one exists (two HBM
    gathers) and falls back to CDF bisection (log2(n_vox) sequential
    gathers -- at flagship scale, 24 x ~400 us PER STEP, which alone
    capped the 325x325x150 LW run near 5e4 photons/s). Both sample the
    exact same voxel PMF; the reference's level/col/voxel scans are
    collapsed the same way (src/monteCarloIllumination.f95:495-498).
    """
    nx, ny, nz = source.grid_shape
    from_atm = u[0] < source.atms_fraction
    n_vox = nx * ny * nz

    if source.em_packed is not None and key is not None:
        # Walker alias: uniform bin + accept-or-redirect. ONE packed
        # [n_vox, 2] row gather (HBM gathers cost per row index, not per
        # byte). Dedicated streams 7/8: reusing u[1]'s fractional part
        # would leave no entropy at n_vox ~ 2^24. NOTE the alias table is
        # in KERNEL flat order (ix*ny + iy)*nz + iz, unlike the CDF.
        bin_ = jax.random.randint(jax.random.fold_in(key, 7), (n,),
                                  0, n_vox, dtype=jnp.int32)
        acc = jax.random.uniform(jax.random.fold_in(key, 8), (n,),
                                 dtype=jnp.float32)
        row = jnp.take(source.em_packed, bin_, axis=0)  # [n, 2]
        flat = jnp.where(acc < row[:, 0], bin_,
                         row[:, 1].astype(jnp.int32))
        flat = jnp.clip(flat, 0, n_vox - 1)
        ii = flat // (ny * nz)
        ij = (flat // nz) % ny
        ik = flat % nz
    else:
        # CDF bisection fallback, [nz, ny, nx] C-order
        flat = jnp.searchsorted(source.voxel_cdf, u[1]).astype(jnp.int32)
        flat = jnp.clip(flat, 0, n_vox - 1)
        ik = flat // (ny * nx)
        ij = (flat // nx) % ny
        ii = flat % nx
    # Uniform position within the voxel, in fractional coordinates
    xf_a = (ii.astype(jnp.float32) + u[2]) / nx
    yf_a = (ij.astype(jnp.float32) + u[3]) / ny
    zf_a = (ik.astype(jnp.float32) + u[4]) / nz
    zf_a = jnp.clip(zf_a, 2.0 ** -24, _TOP)
    # Isotropic direction with a minimum vertical component
    mu_a = 1.0 - 2.0 * u[5]
    mu_a = jnp.where(jnp.abs(mu_a) < _MIN_MU,
                     jnp.sign(mu_a + 1e-30) * _MIN_MU, mu_a)

    # --- surface photons: uniform (x, y), z = 0, Lambertian up ---
    xf_s, yf_s = u[1], u[2]
    zf_s = jnp.zeros((n,), jnp.float32)
    mu_s = jnp.sqrt(jnp.maximum(u[5], jnp.float32(1e-12)))

    xf = jnp.where(from_atm, xf_a, xf_s)
    yf = jnp.where(from_atm, yf_a, yf_s)
    zf = jnp.where(from_atm, zf_a, zf_s)
    mu = jnp.where(from_atm, mu_a, mu_s)
    # Azimuth gets its own dedicated stream: the reference draws independent
    # deviates per field (reference: src/monteCarloIllumination.f95:495-509);
    # reusing the y-offset deviate would correlate sub-voxel position with
    # launch direction (uniform marginals, degenerate joint).
    phi = 2.0 * jnp.pi * u[6]
    return xf, yf, zf, mu, phi
