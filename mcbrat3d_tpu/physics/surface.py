"""Surface reflection: Lambertian albedo and the BRDF extension point.

Re-design of the reference's surface layer (reference:
src/surfaceProperties.f95:32-161): a per-pixel parameter grid (x, y) ->
params with a reflectance function of (params, mu_in, mu_out, phi_in,
phi_out). The shipped implementation is Lambertian, R = params[0]; users
register other BRDF kernels as pure JAX functions.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def lambertian_reflectance(params, mu_in, mu_out, phi_in, phi_out):
    """R = albedo, independent of geometry
    (reference: src/surfaceProperties.f95:153-161)."""
    return params[..., 0]


def rpv_reflectance(params, mu_in, mu_out, phi_in, phi_out):
    """Rahman-Pinty-Verstraete BRDF (the standard land-surface model).

    params = (rho0, k, theta_hg): amplitude, Minnaert exponent, HG asymmetry
    of the scattering lobe (theta < 0: backscattering surfaces). Returns the
    weight multiplier the kernel applies at a surface bounce for the sampled
    outgoing direction. Fills the extension point the reference leaves open
    (reference: src/surfaceProperties.f95:119-147).
    """
    rho0 = params[..., 0]
    k = params[..., 1]
    theta = params[..., 2]
    mu_i = jnp.abs(mu_in)
    mu_r = jnp.clip(jnp.abs(mu_out), 1e-6, 1.0)
    si = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_i**2))
    sr = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_r**2))
    cos_dphi = jnp.cos(phi_out - phi_in)
    # phase angle between incident and reflected rays
    cos_g = mu_i * mu_r + si * sr * cos_dphi
    minnaert = (mu_i * mu_r * (mu_i + mu_r)) ** (k - 1.0)
    hg = (1.0 - theta**2) / (1.0 + theta**2 + 2.0 * theta * cos_g) ** 1.5
    cap_g = jnp.sqrt(jnp.maximum(
        0.0, jnp.tan(jnp.arccos(jnp.clip(mu_i, 1e-6, 1.0)))**2
        + jnp.tan(jnp.arccos(mu_r))**2
        - 2.0 * jnp.tan(jnp.arccos(jnp.clip(mu_i, 1e-6, 1.0)))
        * jnp.tan(jnp.arccos(mu_r)) * cos_dphi))
    hot = 1.0 + (1.0 - rho0) / (1.0 + cap_g)
    return rho0 * minnaert * hg * hot


# Registry of named BRDF kernels; each maps
# (params[..., P], mu_in, mu_out, phi_in, phi_out) -> reflectance.
BRDF_REGISTRY: dict = {"Lambertian": lambertian_reflectance,
                       "RPV": rpv_reflectance}


def register_brdf(name: str, fn: Callable) -> None:
    BRDF_REGISTRY[name] = fn


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Surface:
    """Surface description: per-pixel parameters + a named BRDF kernel.

    ``params``: [nx_s, ny_s, P] parameter grid (any resolution; the kernel
    maps photon (x, y) fractionally onto it, as the reference does for its
    surfaceDescription x/y grid; reference: src/surfaceProperties.f95:119-147).
    For a uniform Lambertian surface this is [1, 1, 1] = albedo.
    """

    params: jax.Array
    brdf_name: str = dataclasses.field(metadata=dict(static=True), default="Lambertian")
    temperature: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    emissivity: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    @staticmethod
    def lambertian(albedo: float, temperature: float = 0.0,
                   emissivity: float = 1.0) -> "Surface":
        return Surface(params=jnp.asarray(np.float32(albedo)).reshape(1, 1, 1),
                       brdf_name="Lambertian",
                       temperature=temperature, emissivity=emissivity)

    @staticmethod
    def rpv(rho0: float, k: float = 1.0, theta: float = 0.0,
            temperature: float = 0.0, emissivity: float = 1.0) -> "Surface":
        """Uniform Rahman-Pinty-Verstraete surface."""
        p = np.asarray([rho0, k, theta], np.float32).reshape(1, 1, 3)
        return Surface(params=jnp.asarray(p), brdf_name="RPV",
                       temperature=temperature, emissivity=emissivity)

    @property
    def is_uniform_lambertian(self) -> bool:
        return (self.brdf_name == "Lambertian"
                and self.params.shape[0] == 1 and self.params.shape[1] == 1)

    @property
    def is_lambertian_grid(self) -> bool:
        """Lambertian BRDF with a per-pixel albedo grid (any resolution).

        The record megakernel covers this per-pixel form when the grid
        divides the domain columns evenly (transport/pallas_kernel.py:
        surface_px_ok); the XLA path covers it unconditionally.
        Reference per-pixel surface grid: src/surfaceProperties.f95:32-36.
        """
        return self.brdf_name == "Lambertian" and self.params.shape[2] == 1

    @property
    def is_uniform_rpv(self) -> bool:
        """Uniform scalar-parameter RPV surface (the record megakernel
        evaluates this BRDF in-kernel; see transport/pallas_kernel.py)."""
        return (self.brdf_name == "RPV"
                and self.params.shape[0] == 1 and self.params.shape[1] == 1)

    def reflectance(self, x_frac, y_frac, mu_in, mu_out, phi_in, phi_out):
        """Reflectance for photons at fractional domain position (x, y)."""
        fn = BRDF_REGISTRY[self.brdf_name]
        nxs, nys, _ = self.params.shape
        ix = jnp.clip((x_frac * nxs).astype(jnp.int32), 0, nxs - 1)
        iy = jnp.clip((y_frac * nys).astype(jnp.int32), 0, nys - 1)
        params = self.params[ix, iy]
        return fn(params, mu_in, mu_out, phi_in, phi_out)
