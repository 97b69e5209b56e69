"""Vectorized DDA voxel ray marcher.

Wave-parallel re-design of ``accumulateExtinctionAlongPath`` (reference:
src/opticalProperties.f95:1656-1815): trace a bundle of rays through the
gridded extinction field, accumulating optical depth until either the domain
boundary is reached or an optional target optical depth ``tau_stop`` is hit.
Used by the ray-traced free-path sampler and by local estimation
(transmittance toward the radiance detectors).

Index tracking is incremental (cell indices are part of the marcher state)
because positions land exactly on cell faces at each crossing, where
position->index lookup is ambiguous. Rounding robustness: per-dimension
steps are clamped to >= 0 and any dimension whose face distance ties the
minimum is snapped to its face and incremented, so a ray that rounds one ulp
past a face self-heals on the next iteration (the reference instead nudges
by 2*spacing; reference: src/opticalProperties.f95:1749-1777).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(3e38)


def trace(domain, x, y, z, ux, uy, uz, active, tau_stop=None,
          max_crossings: int = 0):
    """March rays until boundary exit or tau_stop.

    Args:
      domain: OpticalDomain.
      x, y, z: [N] starting positions (strictly inside the domain).
      ux, uy, uz: [N] unit direction cosines.
      active: [N] bool, lanes to trace.
      tau_stop: optional [N] target optical depth; tracing stops once the
        accumulated depth reaches it (collision point found).
      max_crossings: static bound on voxel crossings (0 -> auto).

    Returns dict with:
      tau: [N] accumulated optical depth (== tau_stop where stopped early;
           -1 where the crossing budget ran out: the 'bad photon' flag,
           reference: src/opticalProperties.f95:1719-1722 semantics),
      x, y, z: [N] final positions,
      ix, iy: [N] final horizontal cell indices (tally pixel for boundary
           crossings),
      exit_top, exit_bot, stopped: [N] bool outcome flags.
    """
    grid = domain.grid
    nx, ny, nz = grid.shape
    xe, ye, ze = grid.x_edges, grid.y_edges, grid.z_edges
    ext_flat = domain.total_ext.reshape(-1)

    if max_crossings <= 0:
        max_crossings = 4 * (nx + ny + nz) + 64

    ix = grid.locate_x(x)
    iy = grid.locate_y(y)
    iz = grid.locate_z(z)

    has_stop = tau_stop is not None
    if not has_stop:
        tau_stop = jnp.full_like(x, BIG)

    pos_x = jnp.where(ux >= 0, 1, 0).astype(jnp.int32)
    pos_y = jnp.where(uy >= 0, 1, 0).astype(jnp.int32)
    pos_z = jnp.where(uz >= 0, 1, 0).astype(jnp.int32)
    inc_x = 2 * pos_x - 1
    inc_y = 2 * pos_y - 1
    inc_z = 2 * pos_z - 1

    inv_ux = jnp.where(jnp.abs(ux) < 1e-12, BIG, 1.0 / jnp.where(ux == 0, 1.0, ux))
    inv_uy = jnp.where(jnp.abs(uy) < 1e-12, BIG, 1.0 / jnp.where(uy == 0, 1.0, uy))
    inv_uz = jnp.where(jnp.abs(uz) < 1e-12, BIG, 1.0 / jnp.where(uz == 0, 1.0, uz))

    state = dict(
        x=x, y=y, z=z, ix=ix, iy=iy, iz=iz,
        tau=jnp.zeros_like(x),
        running=active,
        exit_top=jnp.zeros_like(active),
        exit_bot=jnp.zeros_like(active),
        stopped=jnp.zeros_like(active),
        n=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["running"]) & (s["n"] < max_crossings)

    def body(s):
        sx, sy, sz = s["x"], s["y"], s["z"]
        six, siy, siz = s["ix"], s["iy"], s["iz"]
        run = s["running"]

        # Distance to the next face in each dimension (clamped >= 0).
        tx = jnp.maximum((xe[six + pos_x] - sx) * inv_ux, 0.0)
        ty = jnp.maximum((ye[siy + pos_y] - sy) * inv_uy, 0.0)
        tz = jnp.maximum((ze[siz + pos_z] - sz) * inv_uz, 0.0)
        tx = jnp.where(jnp.abs(ux) < 1e-12, BIG, tx)
        ty = jnp.where(jnp.abs(uy) < 1e-12, BIG, ty)
        tz = jnp.where(jnp.abs(uz) < 1e-12, BIG, tz)
        t = jnp.minimum(tx, jnp.minimum(ty, tz))

        cell = (six * ny + siy) * nz + siz
        beta = ext_flat[cell]

        # Early stop inside this cell once tau_stop is reached
        # (reference: src/opticalProperties.f95:1729-1739).
        d_tau = t * beta
        hits_stop = run & (s["tau"] + d_tau > tau_stop) if has_stop else (
            jnp.zeros_like(run))
        t_part = jnp.where(beta > 0, (tau_stop - s["tau"]) / jnp.maximum(beta, 1e-30), 0.0)
        t_eff = jnp.where(hits_stop, t_part, t)

        new_tau = jnp.where(run, jnp.where(hits_stop, tau_stop, s["tau"] + d_tau), s["tau"])

        # Advance positions; crossing dims snap exactly to the face.
        cross_x = run & ~hits_stop & (tx <= t)
        cross_y = run & ~hits_stop & (ty <= t)
        cross_z = run & ~hits_stop & (tz <= t)

        nx_pos = jnp.where(cross_x, xe[six + pos_x], sx + t_eff * ux)
        ny_pos = jnp.where(cross_y, ye[siy + pos_y], sy + t_eff * uy)
        nz_pos = jnp.where(cross_z, ze[siz + pos_z], sz + t_eff * uz)

        nix = six + jnp.where(cross_x, inc_x, 0)
        niy = siy + jnp.where(cross_y, inc_y, 0)
        niz = siz + jnp.where(cross_z, inc_z, 0)

        # Periodic wrap in x and y (reference:
        # src/opticalProperties.f95:1782-1796).
        wrap_lo_x = nix < 0
        wrap_hi_x = nix >= nx
        nix = jnp.where(wrap_lo_x, nx - 1, jnp.where(wrap_hi_x, 0, nix))
        nx_pos = jnp.where(wrap_lo_x, xe[-1], jnp.where(wrap_hi_x, xe[0], nx_pos))
        wrap_lo_y = niy < 0
        wrap_hi_y = niy >= ny
        niy = jnp.where(wrap_lo_y, ny - 1, jnp.where(wrap_hi_y, 0, niy))
        ny_pos = jnp.where(wrap_lo_y, ye[-1], jnp.where(wrap_hi_y, 0 * ny_pos + ye[0], ny_pos))

        # Domain exit in z (reference: src/opticalProperties.f95:1799-1812).
        out_top = run & (niz >= nz)
        out_bot = run & (niz < 0)
        niz = jnp.clip(niz, 0, nz - 1)

        still = run & ~hits_stop & ~out_top & ~out_bot

        return dict(
            x=jnp.where(run, nx_pos, sx),
            y=jnp.where(run, ny_pos, sy),
            z=jnp.where(run, nz_pos, sz),
            ix=jnp.where(run, nix, six),
            iy=jnp.where(run, niy, siy),
            iz=jnp.where(run, niz, siz),
            tau=new_tau,
            running=still,
            exit_top=s["exit_top"] | out_top,
            exit_bot=s["exit_bot"] | out_bot,
            stopped=s["stopped"] | hits_stop,
            n=s["n"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    # Lanes still running at the crossing cap: flag tau = -1 ('bad photon').
    tau = jnp.where(s["running"], -1.0, s["tau"])
    return dict(tau=tau, x=s["x"], y=s["y"], z=s["z"],
                ix=s["ix"], iy=s["iy"],
                exit_top=s["exit_top"], exit_bot=s["exit_bot"],
                stopped=s["stopped"])
