"""Surface reflection: Lambertian albedo and the BRDF extension point.

Re-design of the reference's surface layer (reference:
src/surfaceProperties.f95:32-161): a per-pixel parameter grid (x, y) ->
params with a reflectance function of (params, mu_in, mu_out, phi_in,
phi_out). The shipped implementation is Lambertian, R = params[0]; users
register other BRDF kernels as pure JAX functions.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def lambertian_reflectance(params, mu_in, mu_out, phi_in, phi_out):
    """R = albedo, independent of geometry
    (reference: src/surfaceProperties.f95:153-161)."""
    return params[..., 0]


# Registry of named BRDF kernels; each maps
# (params[..., P], mu_in, mu_out, phi_in, phi_out) -> reflectance.
BRDF_REGISTRY: dict = {"Lambertian": lambertian_reflectance}


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

    @property
    def is_uniform_lambertian(self) -> bool:
        return (self.brdf_name == "Lambertian"
                and self.params.shape[0] == 1 and self.params.shape[1] == 1)

    def reflectance(self, x_frac, y_frac, mu_in, mu_out, phi_in, phi_out):
        """Reflectance for photons at fractional domain position (x, y)."""
        fn = BRDF_REGISTRY[self.brdf_name]
        nxs, nys, _ = self.params.shape
        ix = jnp.clip((x_frac * nxs).astype(jnp.int32), 0, nxs - 1)
        iy = jnp.clip((y_frac * nys).astype(jnp.int32), 0, nys - 1)
        params = self.params[ix, iy]
        return fn(params, mu_in, mu_out, phi_in, phi_out)
