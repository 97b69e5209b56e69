"""Domain grid geometry with regular-spacing fast paths.

Equivalent of the integrator's cached geometry + index searches
(reference: Integrators/monteCarloRadiativeTransfer.f95:1551-1592, the
``findXYIndicies``/``findZIndex`` pair with ``xyRegularlySpaced`` /
``zRegularlySpaced`` fast paths).  On TPU the irregular path is a vectorized
``searchsorted`` (log2(n) gathers per lane); the regular path is a single
fused multiply-floor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Cell-edge geometry of the 3D domain (periodic in x and y).

    Edge arrays have length n+1 for n cells. ``*_regular`` are static
    (trace-time) flags selecting the fast index path.
    """

    x_edges: jax.Array
    y_edges: jax.Array
    z_edges: jax.Array
    xy_regular: bool = dataclasses.field(metadata=dict(static=True), default=True)
    z_regular: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @staticmethod
    def from_edges(x_edges, y_edges, z_edges) -> "Grid":
        """Build a Grid, detecting regular spacing (like new_Integrator does,
        reference: Integrators/monteCarloRadiativeTransfer.f95:139-165)."""
        xe = np.asarray(x_edges, np.float32)
        ye = np.asarray(y_edges, np.float32)
        ze = np.asarray(z_edges, np.float32)

        def _regular(e):
            d = np.diff(e)
            return bool(np.all(np.abs(d - d[0]) <= 4 * np.spacing(e[-1]))) and e.size > 1

        g = Grid(
            x_edges=jnp.asarray(xe),
            y_edges=jnp.asarray(ye),
            z_edges=jnp.asarray(ze),
            xy_regular=_regular(xe) and _regular(ye),
            z_regular=_regular(ze),
        )
        g._cache_edges(xe, ye, ze)
        return g

    @staticmethod
    def regular(nx, ny, nz, dx, dy, dz, x0=0.0, y0=0.0, z0=0.0) -> "Grid":
        xe = (x0 + dx * np.arange(nx + 1)).astype(np.float32)
        ye = (y0 + dy * np.arange(ny + 1)).astype(np.float32)
        ze = (z0 + dz * np.arange(nz + 1)).astype(np.float32)
        g = Grid(
            x_edges=jnp.asarray(xe),
            y_edges=jnp.asarray(ye),
            z_edges=jnp.asarray(ze),
            xy_regular=True,
            z_regular=True,
        )
        g._cache_edges(xe, ye, ze)
        return g

    def _cache_edges(self, xe, ye, ze):
        object.__setattr__(self, "_edges_np",
                           (np.asarray(xe, np.float64),
                            np.asarray(ye, np.float64),
                            np.asarray(ze, np.float64)))

    # ---- host-side geometry (setup code; NOT for traced values) ----
    def edges_np(self):
        """(x_edges, y_edges, z_edges) as float64 NumPy arrays, memoized.

        Host setup code (emission weighting, netCDF writers, separable
        detection) reads grid edges repeatedly; each naive
        ``np.asarray(grid.z_edges)`` is a device fetch that can block for
        MINUTES behind a wedged TPU relay (measured 121 s per 129-element
        fetch; the plan_march hazard,
        transport/pallas_kernel._grid_march_scalars). Grids built through
        from_edges/regular cache the host copies eagerly at construction
        (zero fetches); this lazy path only runs for grids rebuilt by
        pytree unflattening. Only call with concrete edges (never inside
        jit)."""
        cached = object.__getattribute__(self, "__dict__").get("_edges_np")
        if cached is None:
            cached = (np.asarray(self.x_edges, np.float64),
                      np.asarray(self.y_edges, np.float64),
                      np.asarray(self.z_edges, np.float64))
            object.__setattr__(self, "_edges_np", cached)
        return cached

    # ---- static shape info (usable at trace time) ----
    @property
    def nx(self) -> int:
        return self.x_edges.shape[0] - 1

    @property
    def ny(self) -> int:
        return self.y_edges.shape[0] - 1

    @property
    def nz(self) -> int:
        return self.z_edges.shape[0] - 1

    @property
    def shape(self):
        return (self.nx, self.ny, self.nz)

    # ---- traced geometry ----
    @property
    def x0(self):
        return self.x_edges[0]

    @property
    def y0(self):
        return self.y_edges[0]

    @property
    def z0(self):
        return self.z_edges[0]

    @property
    def x_max(self):
        return self.x_edges[-1]

    @property
    def y_max(self):
        return self.y_edges[-1]

    @property
    def z_max(self):
        return self.z_edges[-1]

    def wrap_x(self, x):
        """Periodic wrap in x. Replaces the reference's O(n) loop
        (reference: Integrators/monteCarloRadiativeTransfer.f95:1898-1917)
        with fmod -- branch-free on the VPU."""
        return self.x0 + jnp.mod(x - self.x0, self.x_max - self.x0)

    def wrap_y(self, y):
        return self.y0 + jnp.mod(y - self.y0, self.y_max - self.y0)

    def locate_x(self, x):
        """Cell index along x for positions already inside the domain."""
        return _locate(x, self.x_edges, self.xy_regular)

    def locate_y(self, y):
        return _locate(y, self.y_edges, self.xy_regular)

    def locate_z(self, z):
        return _locate(z, self.z_edges, self.z_regular)

    def z_from_fraction(self, zf):
        """Map a fractional height in [0,1] to a physical z.

        The photon-source constructors hand out fractional positions; the
        reference maps them layerwise so each of the nz layers receives a
        uniform share (reference:
        Integrators/monteCarloRadiativeTransfer.f95:484-494).
        """
        nz = self.nz
        if self.z_regular:
            return self.z0 + zf * (self.z_max - self.z0)
        t = zf * nz
        k = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, nz - 1)
        frac = t - k.astype(jnp.float32)
        lo = self.z_edges[k]
        hi = self.z_edges[k + 1]
        return lo + frac * (hi - lo)


def _locate(pos, edges, regular: bool):
    """Index of the cell containing ``pos``; clipped to valid range."""
    n = edges.shape[0] - 1
    if regular:
        inv_d = (n / (edges[-1] - edges[0])).astype(jnp.float32)
        idx = jnp.floor((pos - edges[0]) * inv_d).astype(jnp.int32)
    else:
        idx = jnp.searchsorted(edges, pos, side="right").astype(jnp.int32) - 1
    return jnp.clip(idx, 0, n - 1)
