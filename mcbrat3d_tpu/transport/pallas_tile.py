"""Tiled dense-domain megakernel: sorted photon cohorts x VMEM tile slabs.

The general-domain fast path for dense NON-template 3D extinction fields
past the record kernel's gather envelope -- the BASELINE.md "MODIS-class"
configuration (arbitrary per-cell beta at 128x128x64 and beyond) that the
reference handles with its replicated-domain memory model
(reference: src/opticalProperties.f95:77-115) and that previously fell to
the XLA wave kernel (measured 0.069 M photons/s on the 128x128x64 dense
broken-cloud scene, EXPERIMENTS_1e8.md "Round 5: the dense non-template
3D floor").

Design (why this shape; measurements from tools/exp_tile1.py, v5e):

* The per-event record fetch is the wall for dense domains: one-hot MXU
  gathers cost Theta(cells) MACs/lane-event (0.17 G lane-steps/s at
  16384 cells), while the per-lane take_along+select chain is near-FLAT
  in table rows up to 128 rows (2.4 G lane-steps/s at 16384 cells) but
  cannot reach 1M cells (8192-row chains are compile- and VPU-bound).
* So the domain is cut into TILES of <= 32768 cells (<= 256 table
  rows; each chain row is one wide vector op amortized over 128 lanes,
  ~0.14 ns/lane-step, so big tiles buy fewer cohort passes almost for
  free). The per-tile-packed extinction slabs live in HBM
  ([n_tiles + 1, t_rows, 128]; no VMEM cap on domain size) and each
  kernel block's slab is DMA'd by a scalar-prefetched BlockSpec
  index_map keyed on the block's tile id.
* Photons are grouped into per-tile cohorts between kernel calls by ONE
  `lax.sort` of (tile_id, lane) pairs plus a segment-padded gather
  (every kernel block then holds lanes of exactly one tile). Measured
  bookkeeping: ~27 ms sort + ~32 ms state gather per 1M photons -- the
  pass tax that tile size must amortize (the planner maximizes the
  physical tile chord to minimize crossings per photon).
* Each tile carries its own Woodcock majorant (maximum extinction over
  the tile), so clear-sky tiles cost one boundary step; a photon
  crossing into a ZERO-majorant tile is advanced analytically through
  up to `skip_iters` further empty tiles in the same step (exact: no
  collision is possible where the majorant is zero). Crossings that
  would exit the domain top/bottom during the skip PARK at the
  boundary-adjacent tile instead, so every boundary tally lands in the
  block tile's own footprint and the per-event tally one-hot stays
  Theta(tile footprint), not Theta(nx*ny).

Physics matches the record megakernel's flux pipeline exactly (max
cross-section transport, absorb w*(1-ssa) + weight multiply, Russian
roulette, analytic HG scatter + rotation, Lambertian surface with
cosine-law re-emission, periodic x/y; reference:
Integrators/monteCarloRadiativeTransfer.f95:393-841, :566-571 max-xsec
mode, :641-702 surface, :805-811 roulette); tallies are fluxUp/fluxDown
and per-column absorbed flux (the reference's optional-output contract,
Drivers/monteCarloDriver.f95:1324).

Envelope (pallas_tile_eligible): single component (per-cell extinction
AND per-cell single-scattering albedo supported; a second slab block
carries non-uniform ssa), analytic uniform HG asymmetry, non-emission
sources, uniform Lambertian surface, flux-only outputs, regular grid,
and a tile plan with n_tiles <= 127. Everything else falls through to
the XLA wave kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.pallas_kernel import (_TINY, _TOP_EPS,
                                                  _hif_gather2w,
                                                  _make_uniform, _obj_cache,
                                                  _pack_inverse_table)

_BIG = np.float32(3e38)

# Tile envelope: the select chain's per-row cost is a WIDE vector op
# amortized over 128 lanes (~0.14 ns/lane-step/row), so even 256-row
# chains are cheap next to the per-pass sort/gather tax -- bigger tiles
# buy fewer cohort passes almost for free (measured on the 128x128x64
# dense scene: 16384-cell tiles 0.45 M photons/s, 32768-cell tiles
# 1.21 M/s, same 109 steps/photon). 256 rows bounds compile time and
# the double-buffered slab DMA (128 KB/buffer). Tile ids must fit one
# [*, 128] majorant row for the per-lane empty-skip gather (DEAD
# sentinel = n_tiles must also be a valid lane index, hence 127).
TILE_CELLS_MAX = 256 * 128
MAX_TILES = 127

# Grid-step cap: (rows_b=16, 320 blocks) hard-faulted the TPU worker
# while 192 blocks (and 160 at rows_b=32) run clean -- the crash class
# scales with the grid length at this block shape (Mosaic-side; kernel
# logic A/Bs clean in interpret mode, same family as the round-5
# 32768-cell record-kernel fault). run_batch_pallas_tile auto-raises
# rows_b to keep every launch at or under the proven grid length.
MAX_BLOCKS = 192


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Static launch geometry for the tiled megakernel."""

    rows_b: int = 16        # lanes per block = rows_b * 128 (cohort width)
    k_steps: int = 24       # transport steps per block visit (per pass)
    skip_iters: int = 4     # empty-tile skip chain per crossing
    max_passes: int = 8192  # safety cap on sort+transport passes
    # Drain floor: once the photon quota is exhausted, stop when fewer
    # than pool/drain_div lanes remain alive and count the survivors in
    # n_bad. Rare near-horizontal photons wandering zero-extinction
    # regions (no collisions -> no roulette) live for HUNDREDS of
    # passes, and every drain pass pays the full sort cost -- measured
    # 756 passes for a 2-wave run whose productive phase was ~25 passes.
    # This is the tiled analog of the reference's step cap + nBad
    # accounting (Integrators/monteCarloRadiativeTransfer.f95:562-563);
    # the truncation fraction is bounded by 1/drain_div and reported.
    drain_div: int = 64
    interpret: bool = False
    # test hook: force a specific (tx, ty, tz) tile plan so small CPU
    # domains still exercise the multi-tile sort/pack/crossing machinery
    force_tiles: Optional[tuple] = None


_PLAN_CACHE = {}


def plan_for(domain: OpticalDomain) -> Optional[tuple]:
    """Tile plan with the per-cell FIELD count folded into the cell cap:
    the collision unrolls n_f select chains of t_rows ops each, so the
    cap keeps n_f * t_rows <= 1024 (2 x the hardware-proven 512-op
    scale) to bound compile time and the step body."""
    n_f = tile_fields(domain)[0]
    rows_max = max(8, (1024 // max(n_f, 1)) // 8 * 8)
    return plan_tiles(domain.grid,
                      cells_max=min(TILE_CELLS_MAX, rows_max * 128))


def plan_tiles(grid, cells_max: int = TILE_CELLS_MAX) -> Optional[tuple]:
    """Choose (tx, ty, tz) tile dims: divisors of the grid shape whose
    tiles hold <= TILE_CELLS_MAX cells with <= MAX_TILES tiles, minimizing
    the expected tile-crossing rate per unit path length
    (1/Tx + 1/Ty + 1/Tz in physical units). None when no plan exists.
    Falls back to cell-unit weighting when the grid edges are traced
    (run_batch dispatch may run under jit)."""
    nx, ny, nz = grid.shape
    try:
        dx = float(grid.x_edges[-1] - grid.x_edges[0]) / nx
        dy = float(grid.y_edges[-1] - grid.y_edges[0]) / ny
        dz = float(grid.z_edges[-1] - grid.z_edges[0]) / nz
    except Exception:  # traced edges: plan on cell counts
        dx = dy = dz = 1.0
    ck = (nx, ny, nz, dx, dy, dz, cells_max)
    hit = _PLAN_CACHE.get(ck)
    if hit is not None or ck in _PLAN_CACHE:
        return hit
    plan = _plan_tiles_impl(nx, ny, nz, dx, dy, dz, cells_max)
    _PLAN_CACHE[ck] = plan
    return plan


def _plan_tiles_impl(nx, ny, nz, dx, dy, dz, cells_max) -> Optional[tuple]:

    def divisors(n):
        return [d for d in range(1, n + 1) if n % d == 0]

    best, best_cost = None, None
    for tx in divisors(nx):
        for ty in divisors(ny):
            for tz in divisors(nz):
                cells = tx * ty * tz
                n_tiles = (nx // tx) * (ny // ty) * (nz // tz)
                if cells > cells_max or n_tiles > MAX_TILES:
                    continue
                cost = (1.0 / (tx * dx) + 1.0 / (ty * dy)
                        + 1.0 / (tz * dz))
                if best_cost is None or cost < best_cost - 1e-12 or (
                        abs(cost - best_cost) <= 1e-12
                        and cells > best[0] * best[1] * best[2]):
                    best, best_cost = (tx, ty, tz), cost
    return best


def pallas_tile_eligible(domain: OpticalDomain, surface: Surface,
                         source: illumination.Source,
                         lw_mode: bool, compute_intensity: bool,
                         record_scattering_orders: int,
                         use_ray_tracing: bool,
                         need_volume_absorption: bool,
                         need_absorption_profile: bool = False) -> bool:
    return not tile_ineligibility_reasons(
        domain, surface, source, lw_mode, compute_intensity,
        record_scattering_orders, use_ray_tracing,
        need_volume_absorption, need_absorption_profile)


def tile_ineligibility_reasons(domain: OpticalDomain, surface: Surface,
                               source: illumination.Source,
                               lw_mode: bool, compute_intensity: bool,
                               record_scattering_orders: int,
                               use_ray_tracing: bool,
                               need_volume_absorption: bool,
                               need_absorption_profile: bool = False):
    """Names of every failing tiled-megakernel predicate (empty = ok)."""
    grid = domain.grid
    checks = [
        ("lw_mode", not lw_mode),
        ("compute_intensity", not compute_intensity),
        ("record_scattering_orders", record_scattering_orders == 0),
        ("use_ray_tracing", not use_ray_tracing),
        ("need_volume_absorption", not need_volume_absorption),
        ("need_absorption_profile", not need_absorption_profile),
        ("domain has no per-cell records", domain.cell_records is not None),
        (f"n_components={domain.n_components} > 3",
         domain.n_components <= 3),
        ("non-analytic oversize phase table",
         domain.all_hg or domain.tables.inverse.size <= 131072),
        ("emission source", source.kind != illumination.EMISSION),
        ("non-uniform-Lambertian surface", surface.is_uniform_lambertian),
        ("irregular grid", grid.xy_regular and grid.z_regular),
        ("no tile plan", plan_for(domain) is not None),
    ]
    return [name for name, ok in checks if not ok]


def _ceil(a, b):
    return -(-a // b)


def guard_rows_b(rows_b: int, n_pool: int, n_tiles: int) -> int:
    """Smallest block width (power-of-2 multiple of ``rows_b``) whose
    launch stays within the proven MAX_BLOCKS grid length (the Mosaic
    fault envelope; see the MAX_BLOCKS note)."""
    while rows_b < 256:
        B = rows_b * 128
        n_pool_r = _ceil(n_pool, B) * B
        if (n_pool_r + n_tiles * B) // B <= MAX_BLOCKS:
            break
        rows_b *= 2
    return rows_b


def tile_fields(domain: OpticalDomain):
    """Static per-cell field spec the collision gathers (one select
    chain per field; mirrors the record kernel's scattering-coefficient
    formulation, _pack_tables): ncomp == 1 -> [beta (, ssa) (, f2)]
    with the ssa/f2 chains skipped when uniform; ncomp 2..3 ->
    [beta, ssa_eff, cs_0 (, cs_1), f2_0, f2_1 (, f2_2)]. f2 is the
    component's HG asymmetry (analytic domains) or its global stacked
    inverse-CDF row (tabulated)."""
    ncomp = domain.n_components
    if ncomp == 1:
        need_ssa = not domain.uniform_ssa
        need_f2 = not ((domain.all_hg and domain.uniform_hg)
                       or (not domain.all_hg
                           and domain.tables.inverse.shape[0] == 1))
        return (1 + int(need_ssa) + int(need_f2), need_ssa, need_f2,
                ncomp)
    return 2 + (ncomp - 1) + ncomp, True, True, ncomp


def _pack_tile_table(domain: OpticalDomain, tx: int, ty: int, tz: int):
    """Pack per-tile cell-field slabs: [n_tiles + 1, n_f * t_rows, 128]
    f32, tile t's slab holding its cells in local (x-major, y, z-minor)
    order -- rows [0, t_rows) extinction, rows [t_rows, 2 t_rows) the
    per-cell single-scattering albedo when the domain's is non-uniform
    (slab n_tiles = zeros, the DEAD block target) -- plus the per-tile
    majorants. The slab table lives in HBM; the kernel's BlockSpec
    index_map (keyed by the prefetched per-block tile ids) DMAs one
    slab per grid step -- no dynamic VMEM slicing, no VMEM cap on
    total domain size."""
    nx, ny, nz = domain.grid.shape
    ntx, nty, ntz = nx // tx, ny // ty, nz // tz
    n_tiles = ntx * nty * ntz
    t_cells = tx * ty * tz
    t_rows = _ceil(_ceil(t_cells, 128), 8) * 8

    def tile_field(f3):
        a = f3.astype(jnp.float32).reshape(ntx, tx, nty, ty, ntz, tz)
        return a.transpose(0, 2, 4, 1, 3, 5).reshape(n_tiles, t_cells)

    a = tile_field(domain.total_ext)
    maj = jnp.max(a, axis=1)
    pad = t_rows * 128 - t_cells

    def blockify(at):
        return jnp.pad(at, ((0, 1), (0, pad))).reshape(
            n_tiles + 1, t_rows, 128)

    rec = domain.cell_records
    shape3 = (nx, ny, nz)
    _, need_ssa, need_f2, ncomp = tile_fields(domain)
    if ncomp == 1:
        parts = [a]
        if need_ssa:
            parts.append(tile_field(rec[:, 2 + ncomp].reshape(shape3)))
        if need_f2:
            f2c = (rec[:, 2 + 3 * ncomp] if domain.all_hg
                   else rec[:, 2 + 2 * ncomp]
                   + domain.tables.offsets.astype(jnp.float32)[0])
            parts.append(tile_field(f2c.reshape(shape3)))
    else:
        # scattering-coefficient formulation (same math as
        # pallas_kernel._pack_tables' multi-component branch)
        cumf = rec[:, 2:2 + ncomp]
        ssa_c = rec[:, 2 + ncomp:2 + 2 * ncomp]
        pfi = rec[:, 2 + 2 * ncomp:2 + 3 * ncomp]
        gs = rec[:, 2 + 3 * ncomp:2 + 4 * ncomp]
        frac = jnp.diff(cumf, axis=1, prepend=0.0)
        scat = frac * ssa_c
        ssa_eff = jnp.sum(scat, axis=1)
        cs = jnp.cumsum(scat, axis=1) / jnp.maximum(ssa_eff,
                                                    1e-30)[:, None]
        cs = jnp.where(ssa_eff[:, None] > 0, cs, 1.0)
        if domain.all_hg:
            f2 = gs
        else:
            offs = domain.tables.offsets.astype(jnp.float32)
            f2 = pfi + offs[None, :]
        parts = [a, tile_field(ssa_eff.reshape(shape3))]
        for c in range(ncomp - 1):
            parts.append(tile_field(cs[:, c].reshape(shape3)))
        for c in range(ncomp):
            parts.append(tile_field(f2[:, c].reshape(shape3)))
    tab = jnp.concatenate([blockify(p) for p in parts], axis=1)
    # per-tile-id majorant row for the per-lane empty-skip gather
    # (row 0 of an [8, 128] block; ids beyond n_tiles read 0 = DEAD)
    majrow = jnp.zeros((8, 128), jnp.float32)
    majrow = majrow.at[0, :n_tiles].set(maj)
    # SMEM copy (+ DEAD slot) for the per-block scalar read
    majs = jnp.concatenate([maj, jnp.zeros((1,), jnp.float32)])
    return tab, majs, majrow, t_rows


def _build_tile_kernel(shape, tiles, tcfg: TileConfig, n_blocks: int,
                       t_rows: int, ft_rows: int, f_rows: int,
                       use_rr: bool, ncomp: int, need_ssa: bool,
                       need_f2: bool, analytic_hg: bool = True,
                       inv_hp: int = 8, inv_n_steps: int = 0):
    nx, ny, nz = shape
    tx, ty, tz = tiles
    ntx, nty, ntz = nx // tx, ny // ty, nz // tz
    n_tiles = ntx * nty * ntz
    rows_b = tcfg.rows_b
    k_steps = tcfg.k_steps
    foot = tx * ty

    def kernel(bt_ref, scal_ref, par_ref, majs_ref,
               majrow_ref, tab_blk_ref, inv_ref,
               x_in, y_in, z_in, ux_in, uy_in, uz_in, w_in, tile_in,
               x_out, y_out, z_out, ux_out, uy_out, uz_out, w_out,
               tile_out, acc_ref, nstat_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            for j in range(8):
                nstat_ref[0, j] = 0.0

        seed = scal_ref[0]
        pass_i = scal_ref[1]
        x0 = par_ref[0, 0]
        lx = par_ref[0, 1]
        y0 = par_ref[0, 2]
        ly = par_ref[0, 3]
        z0 = par_ref[0, 4]
        lz = par_ref[0, 5]
        albedo = par_ref[0, 6]
        ssa_u = par_ref[0, 7]
        g_hg_s = par_ref[0, 8]
        rr_w = par_ref[0, 9]
        inv_dx = nx / lx
        inv_dy = ny / ly
        inv_dz = nz / lz
        dxc = lx / nx
        dyc = ly / ny
        dzc = lz / nz
        z_max = z0 + lz
        z_eps = lz * _TOP_EPS
        nudge = 1e-5 * jnp.minimum(dxc, jnp.minimum(dyc, dzc))

        bt = bt_ref[b]
        bts = jnp.minimum(bt, np.int32(n_tiles - 1))
        live_blk = bt < n_tiles
        maj = majs_ref[bts]
        # tile integer coords (scalars) + physical AABB
        ta = bts // np.int32(nty * ntz)
        rem = bts - ta * np.int32(nty * ntz)
        tb = rem // np.int32(ntz)
        tc = rem - tb * np.int32(ntz)
        txp = tx * dxc
        typ = ty * dyc
        tzp = tz * dzc
        tx0p = x0 + ta.astype(jnp.float32) * txp
        ty0p = y0 + tb.astype(jnp.float32) * typ
        tz0p = z0 + tc.astype(jnp.float32) * tzp
        tx1p = tx0p + txp
        ty1p = ty0p + typ
        tz1p = tz0p + tzp
        foot_i = ta * np.int32(nty) + tb

        # this block's tile slab arrives via the BlockSpec index_map
        # (tab_blk_ref = [1, t_rows, 128], DMA'd per grid step keyed by
        # the prefetched bt_ref; DEAD blocks map to the zero slab)

        if tcfg.interpret:
            lane0 = (jax.lax.broadcasted_iota(
                jnp.uint32, (rows_b, 128), 0) * np.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (rows_b, 128), 1)
                + b.astype(jnp.uint32) * np.uint32(rows_b * 128))
            uniform = _make_uniform(lane0, seed.astype(jnp.uint32))
        else:
            pltpu.prng_seed(seed, pass_i * np.int32(n_blocks) + b)

            def uniform(counter, site):
                del counter, site  # order-keyed (record-kernel hw path)
                bits = pltpu.prng_random_bits((rows_b, 128))
                ub = pltpu.bitcast(bits, jnp.uint32) >> np.uint32(8)
                x24 = jax.lax.bitcast_convert_type(ub, jnp.int32)
                return x24.astype(jnp.float32) * np.float32(2.0 ** -24)

        iota_jr = jax.lax.broadcasted_iota(jnp.int32, (ft_rows, 128), 0)
        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (rows_b, 128, 128),
                                             2)

        def tile_of(px, py, pz):
            ixg = jnp.clip(((px - x0) * inv_dx).astype(jnp.int32),
                           0, nx - 1)
            iyg = jnp.clip(((py - y0) * inv_dy).astype(jnp.int32),
                           0, ny - 1)
            izg = jnp.clip(((pz - z0) * inv_dz).astype(jnp.int32),
                           0, nz - 1)
            return (((ixg // tx) * np.int32(nty) + iyg // ty)
                    * np.int32(ntz) + izg // tz)

        def exit_dist(px, py, pz, ux, uy, uz, bx0, bx1, by0, by1, bz0,
                      bz1):
            """Distance to the tile-AABB exit + the crossing axis.

            The axis masks drive TOPOLOGICAL tile updates (increment the
            tile index along the crossing axis) instead of re-deriving
            the tile from the moved position: with f32 positions at
            domain scale, x + ux * nudge can round back to x for small
            direction components, and a position-derived tile id then
            freezes the lane on the face forever. Matches the
            reference's index-stepping DDA contract
            (src/opticalProperties.f95:1705-1712)."""
            sx = jnp.where(
                jnp.abs(ux) > 1e-12,
                (jnp.where(ux >= 0, bx1, bx0) - px)
                / jnp.where(ux == 0, 1.0, ux), _BIG)
            sy = jnp.where(
                jnp.abs(uy) > 1e-12,
                (jnp.where(uy >= 0, by1, by0) - py)
                / jnp.where(uy == 0, 1.0, uy), _BIG)
            sz = jnp.where(
                jnp.abs(uz) > 1e-12,
                (jnp.where(uz >= 0, bz1, bz0) - pz)
                / jnp.where(uz == 0, 1.0, uz), _BIG)
            sx = jnp.maximum(sx, 0.0)
            sy = jnp.maximum(sy, 0.0)
            sz = jnp.maximum(sz, 0.0)
            is_x = (sx <= sy) & (sx <= sz)
            is_y = (~is_x) & (sy <= sz)
            is_z = (~is_x) & (~is_y)
            return (jnp.minimum(sx, jnp.minimum(sy, sz)), is_x, is_y,
                    is_z)

        def step(k, carry):
            x, y, z, ux, uy, uz, w, tile_l = carry
            ctr = (pass_i * np.int32(k_steps) + k).astype(jnp.uint32)
            active = live_blk & (tile_l == bt)
            u_tau = uniform(ctr, 3)
            u_col = uniform(ctr, 4)
            u_ang = uniform(ctr, 5)
            u_phi = uniform(ctr, 6)
            u_rr = uniform(ctr, 7) if use_rr else None
            phi_rot = 2.0 * np.pi * u_phi

            # ---- Woodcock jump against the TILE majorant, clipped at
            # the tile AABB (reference max-xsec mode:
            # Integrators/monteCarloRadiativeTransfer.f95:566-571) ----
            tau = -jnp.log1p(-u_tau)
            d_samp = jnp.where(maj > _TINY, tau / jnp.maximum(maj, _TINY),
                               _BIG)
            t_exit, is_x, is_y, is_z = exit_dist(
                x, y, z, ux, uy, uz, tx0p, tx1p, ty0p, ty1p, tz0p, tz1p)
            collide = active & (d_samp < t_exit)
            d = jnp.where(collide, d_samp, t_exit + nudge)
            xn = x + ux * d
            yn = y + uy * d
            zn = z + uz * d
            cross = active & ~collide
            # domain z-exits are TOPOLOGICAL: a z-face crossing from a
            # boundary tile (tc is this block's scalar z tile index)
            up_face = is_z & (uz > 0)
            dn_face = is_z & (uz < 0)
            exit_top = cross & up_face & (tc == np.int32(ntz - 1))
            exit_bot = cross & dn_face & (tc == np.int32(0))
            crossed = cross & ~exit_top & ~exit_bot
            exits = exit_top | exit_bot

            # boundary crossing point (exit tallies + surface reflection;
            # reference: Integrators/monteCarloRadiativeTransfer.f95:573-640)
            z_b = jnp.where(exit_top, z_max, z0)
            safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
            t_b = (z_b - z) / safe_uz
            xe = x0 + jnp.mod(x + ux * t_b - x0, lx)
            ye = y0 + jnp.mod(y + uy * t_b - y0, ly)
            lixe = jnp.clip(((xe - tx0p) * inv_dx).astype(jnp.int32),
                            0, tx - 1)
            liye = jnp.clip(((ye - ty0p) * inv_dy).astype(jnp.int32),
                            0, ty - 1)
            col_e = lixe * np.int32(ty) + liye

            # collision cell (strictly inside the tile, clamp fp edges)
            lix = jnp.clip(((xn - tx0p) * inv_dx).astype(jnp.int32),
                           0, tx - 1)
            liy = jnp.clip(((yn - ty0p) * inv_dy).astype(jnp.int32),
                           0, ty - 1)
            liz = jnp.clip(((zn - tz0p) * inv_dz).astype(jnp.int32),
                           0, tz - 1)
            lcell = (lix * np.int32(ty) + liy) * np.int32(tz) + liz
            col_c = lix * np.int32(ty) + liy

            # ---- per-lane extinction fetch: take_along + select chain
            # over the tile slab (measured near-flat to 128 rows,
            # tools/exp_tile1.py part A) ----
            lo_g = jnp.bitwise_and(lcell, 127)
            hi_g = jnp.right_shift(lcell, 7)

            def chain(fi):
                v = jnp.zeros((rows_b, 128), jnp.float32)
                for h in range(t_rows):
                    row = jnp.broadcast_to(
                        tab_blk_ref[0, fi * t_rows + h:
                                    fi * t_rows + h + 1, :],
                        (rows_b, 128))
                    got = jnp.take_along_axis(row, lo_g, axis=1)
                    v = jnp.where(hi_g == h, got, v)
                return v

            beta_v = chain(0)
            if ncomp == 1:
                ssa_v = chain(1) if need_ssa else ssa_u
                if need_f2:
                    f2_v = chain(1 + int(need_ssa))
                else:
                    f2_v = jnp.broadcast_to(g_hg_s, (rows_b, 128))
            else:
                # scattering-coefficient formulation: effective ssa +
                # component selection against cumulative scattering
                # fractions with one uniform (reference bisection at
                # ncomp <= 3:
                # Integrators/monteCarloRadiativeTransfer.f95:759-760)
                ssa_v = chain(1)
                cs0 = chain(2)
                cs1 = chain(3) if ncomp == 3 else None
                fb = 1 + ncomp  # first f2 field index
                u_cmp = uniform(ctr, 8)
                if ncomp == 2:
                    f2_v = jnp.where(u_cmp >= cs0, chain(fb + 1),
                                     chain(fb))
                else:
                    f2_v = jnp.where(
                        u_cmp >= cs1, chain(fb + 2),
                        jnp.where(u_cmp >= cs0, chain(fb + 1),
                                  chain(fb)))

            real = collide & (u_col * maj < beta_v)
            absorbed = jnp.where(real, w * (1.0 - ssa_v), 0.0)
            w = jnp.where(real, w * ssa_v, w)

            # ---- Russian roulette (reference:
            # Integrators/monteCarloRadiativeTransfer.f95:805-811) ----
            if use_rr:
                play = real & (w < 0.5 * rr_w)
                survive = u_rr < w / rr_w
                w = jnp.where(play, jnp.where(survive, rr_w, 0.0), w)
            died_w = real & (w <= _TINY)

            # ---- analytic HG scatter + rotation (record-kernel math;
            # reference: Integrators/monteCarloRadiativeTransfer.f95:
            # 1594-1621, 1921-1948) ----
            scatter = real & ~died_w
            if analytic_hg:
                g_hg = f2_v
                g_safe = jnp.where(jnp.abs(g_hg) < 1e-5, 1.0, g_hg)
                s_ = (1.0 - g_hg * g_hg) / (1.0 - g_hg
                                            + 2.0 * g_hg * u_ang)
                ct = (1.0 + g_hg * g_hg - s_ * s_) / (2.0 * g_safe)
                cos_theta = jnp.where(jnp.abs(g_hg) < 1e-5,
                                      2.0 * u_ang - 1.0,
                                      jnp.clip(ct, -1.0, 1.0))
            else:
                # tabulated inverse-CDF angle lookup keyed by the
                # selected component's global phase row (f2; row 0 when
                # the table is a single shared entry). Wide hi-first
                # fetch, the round-5 production form -- reference:
                # Integrators/monteCarloRadiativeTransfer.f95:1594-1621
                t_u = u_ang * np.float32(inv_n_steps - 1)
                k_i = jnp.clip(t_u.astype(jnp.int32), 0,
                               inv_n_steps - 2)
                frac_i = t_u - k_i.astype(jnp.float32)
                if need_f2 or ncomp > 1:
                    flat_i = ((f2_v + 0.5).astype(jnp.int32)
                              * np.int32(inv_n_steps) + k_i)
                else:
                    flat_i = k_i
                lo_i = jnp.bitwise_and(flat_i, 127)
                hi_i = jnp.right_shift(flat_i, 7)
                a0, dd = _hif_gather2w(inv_ref, inv_hp, hi_i, lo_i,
                                       rows_b)
                cos_theta = jnp.cos(a0 + frac_i * dd)
            sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta ** 2))
            cos_phi = jnp.cos(phi_rot)
            sin_phi = jnp.sin(phi_rot)
            denom_sq = jnp.maximum(1.0 - uz * uz, 0.0)
            denom = jnp.sqrt(denom_sq)
            safe = denom > 1e-6
            inv_denom = jnp.where(safe, 1.0 / jnp.maximum(denom, 1e-12),
                                  0.0)
            rx = ux * cos_theta + sin_theta * (
                ux * uz * cos_phi - uy * sin_phi) * inv_denom
            ry = uy * cos_theta + sin_theta * (
                uy * uz * cos_phi + ux * sin_phi) * inv_denom
            rz = uz * cos_theta - sin_theta * cos_phi * denom
            sgn = jnp.sign(jnp.where(uz == 0, 1.0, uz))
            vx = sin_theta * cos_phi
            vy = sgn * sin_theta * sin_phi
            vz = sgn * cos_theta
            ox = jnp.where(safe, rx, vx)
            oy = jnp.where(safe, ry, vy)
            oz = jnp.where(safe, rz, vz)
            oz = jnp.where(jnp.abs(oz) < 1e-4,
                           jnp.sign(jnp.where(oz == 0, 1.0, oz)) * 1e-4,
                           oz)
            inv_norm = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)

            # ---- crossing + empty-tile skip chain ----
            xw = x0 + jnp.mod(xn - x0, lx)
            yw = y0 + jnp.mod(yn - y0, ly)
            zw = jnp.clip(zn, z0 + z_eps, z_max - z_eps)
            # topological neighbor tile along the crossing axis
            # (periodic x/y wrap; z exits were split off above)
            sgn_x = jnp.where(ux >= 0, 1, -1).astype(jnp.int32)
            sgn_y = jnp.where(uy >= 0, 1, -1).astype(jnp.int32)
            sgn_z = jnp.where(uz >= 0, 1, -1).astype(jnp.int32)
            nta = jnp.where(is_x, jnp.mod(ta + sgn_x, np.int32(ntx)), ta)
            ntb = jnp.where(is_y, jnp.mod(tb + sgn_y, np.int32(nty)), tb)
            ntc = jnp.where(is_z, tc + sgn_z, tc)
            tile_n = (nta * np.int32(nty) + ntb) * np.int32(ntz) + ntc

            def skip_body(i, c):
                px, py, pz, tl = c
                mj = jnp.take_along_axis(
                    jnp.broadcast_to(majrow_ref[0:1, :], (rows_b, 128)),
                    jnp.clip(tl, 0, 127), axis=1)
                sk = crossed & (mj <= 0.0)
                tal = tl // np.int32(nty * ntz)
                reml = tl - tal * np.int32(nty * ntz)
                tbl = reml // np.int32(ntz)
                tcl = reml - tbl * np.int32(ntz)
                bx0 = x0 + tal.astype(jnp.float32) * txp
                by0 = y0 + tbl.astype(jnp.float32) * typ
                bz0 = z0 + tcl.astype(jnp.float32) * tzp
                t_x, sk_x, sk_y, sk_z = exit_dist(
                    px, py, pz, ux, uy, uz, bx0, bx0 + txp,
                    by0, by0 + typ, bz0, bz0 + tzp)
                t_x = t_x + nudge
                # crossings that would leave the domain top/bottom PARK
                # here: their exit tally next pass stays in their own
                # block tile's footprint
                zout = sk_z & (((tcl == np.int32(ntz - 1)) & (uz > 0))
                               | ((tcl == np.int32(0)) & (uz < 0)))
                adv = sk & ~zout
                pxn = jnp.where(adv, x0 + jnp.mod(px + ux * t_x - x0, lx),
                                px)
                pyn = jnp.where(adv, y0 + jnp.mod(py + uy * t_x - y0, ly),
                                py)
                pzn2 = jnp.where(adv, jnp.clip(pz + uz * t_x,
                                               z0 + z_eps,
                                               z_max - z_eps), pz)
                sal = jnp.where(sk_x, jnp.mod(tal + sgn_x, np.int32(ntx)),
                                tal)
                sbl = jnp.where(sk_y, jnp.mod(tbl + sgn_y, np.int32(nty)),
                                tbl)
                scl = jnp.where(sk_z, tcl + sgn_z, tcl)
                tl_step = (sal * np.int32(nty) + sbl) * np.int32(ntz) \
                    + scl
                tln = jnp.where(adv, tl_step, tl)
                return pxn, pyn, pzn2, tln

            xw, yw, zw, tile_n = jax.lax.fori_loop(
                0, tcfg.skip_iters, skip_body, (xw, yw, zw, tile_n))

            # ---- surface reflection (uniform Lambertian; reference:
            # Integrators/monteCarloRadiativeTransfer.f95:641-702) ----
            w_down = w
            mu_new = jnp.sqrt(jnp.maximum(u_ang, np.float32(1e-12)))
            sin_new = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_new * mu_new))
            w_refl = w_down * albedo
            died_surface = exit_bot & (w_refl <= _TINY)
            reflected = exit_bot & ~died_surface

            # ---- commit state ----
            x = jnp.where(exit_bot, xe,
                          jnp.where(crossed, xw,
                                    jnp.where(collide, xn, x)))
            y = jnp.where(exit_bot, ye,
                          jnp.where(crossed, yw,
                                    jnp.where(collide, yn, y)))
            z = jnp.where(exit_bot, z0 + z_eps,
                          jnp.where(crossed, zw,
                                    jnp.where(collide,
                                              jnp.clip(zn, z0, z_max),
                                              z)))
            ux = jnp.where(reflected, sin_new * cos_phi,
                           jnp.where(scatter, ox * inv_norm, ux))
            uy = jnp.where(reflected, sin_new * sin_phi,
                           jnp.where(scatter, oy * inv_norm, uy))
            uz = jnp.where(reflected, mu_new,
                           jnp.where(scatter, oz * inv_norm, uz))
            w = jnp.where(reflected, w_refl, w)
            dead_now = exit_top | died_w | died_surface
            tile_l = jnp.where(dead_now, np.int32(n_tiles),
                               jnp.where(crossed, tile_n, tile_l))

            # ---- footprint tally (one event per lane per step):
            # sections [up, down, absorbed-column] in the block tile's
            # local column order ----
            ev = exits | real
            t_val = jnp.where(exit_top, w_down,
                              jnp.where(exit_bot, w_down, absorbed))
            t_val = jnp.where(ev, t_val, 0.0)
            t_idx = jnp.where(
                exit_top, col_e,
                jnp.where(exit_bot, np.int32(f_rows * 128) + col_e,
                          np.int32(2 * f_rows * 128) + col_c))
            t_idx = jnp.where(ev, t_idx, 0)
            hi_t = jnp.right_shift(t_idx, 7)
            lo_t = jnp.bitwise_and(t_idx, 127)
            ohs = (lo_t[:, :, None] == iota_lane).astype(jnp.float32)
            acc_base = pl.multiple_of(foot_i * np.int32(ft_rows), 8)
            contrib = acc_ref[pl.ds(acc_base, ft_rows), :]
            for r in range(rows_b):
                # A[j, l] = t_val[l] * (hi[l] == j); one [ft_rows, 128]
                # x [128, 128] dot scatters this sub-row's events into
                # the block tile's own footprint rows
                a_r = jnp.where(iota_jr == hi_t[r][None, :],
                                t_val[r][None, :], 0.0)
                contrib = contrib + jax.lax.dot_general(
                    a_r, ohs[r], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[pl.ds(acc_base, ft_rows), :] = contrib

            nstat_ref[0, 2] = nstat_ref[0, 2] + jnp.sum(
                real.astype(jnp.float32))
            nstat_ref[0, 3] = nstat_ref[0, 3] + jnp.sum(
                active.astype(jnp.float32))
            return x, y, z, ux, uy, uz, w, tile_l

        carry = (x_in[:], y_in[:], z_in[:], ux_in[:], uy_in[:],
                 uz_in[:], w_in[:], tile_in[:])
        x_f, y_f, z_f, ux_f, uy_f, uz_f, w_f, tile_f = jax.lax.fori_loop(
            0, k_steps, step, carry)
        x_out[:] = x_f
        y_out[:] = y_f
        z_out[:] = z_f
        ux_out[:] = ux_f
        uy_out[:] = uy_f
        uz_out[:] = uz_f
        w_out[:] = w_f
        tile_out[:] = tile_f

    return kernel


_TILE_LAUNCH_CACHE = {}


def _make_tile_launch(shape, tiles, tcfg: TileConfig, n_pool: int,
                      source_kind: str, use_rr: bool, t_rows: int,
                      fields=(1, False, False, 1),
                      analytic_hg: bool = True,
                      inv_hp: int = 8, inv_n_steps: int = 0):
    """Build the whole-run function (inject -> sort/pack -> kernel, in a
    pass while_loop) that run_batch_pallas_tile jits and caches."""
    nx, ny, nz = shape
    tx, ty, tz = tiles
    ntx, nty, ntz = nx // tx, ny // ty, nz // tz
    n_tiles = ntx * nty * ntz
    foot = tx * ty
    f_rows = _ceil(foot, 128)
    ft_rows = _ceil(3 * f_rows, 8) * 8
    n_foot = ntx * nty
    acc_rows = n_foot * ft_rows
    B = tcfg.rows_b * 128
    n_pool_r = _ceil(n_pool, B) * B
    n_pad = n_pool_r + n_tiles * B
    n_blocks = n_pad // B
    if n_pad >= 1 << 24:
        raise ValueError("photon pool exceeds the packed-sort slot "
                         f"range (n_pad={n_pad} >= 2^24)")
    rows_tot = n_pad // 128
    DEAD = np.int32(n_tiles)

    n_f, need_ssa, need_f2, ncomp = fields
    kernel = _build_tile_kernel(shape, tiles, tcfg, n_blocks, t_rows,
                                ft_rows, f_rows, use_rr, ncomp,
                                need_ssa, need_f2,
                                analytic_hg, inv_hp, inv_n_steps)

    state_spec = pl.BlockSpec((tcfg.rows_b, 128),
                              lambda b, bt: (b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bt_arr: per-block tile ids
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        # tile slab: one [1, t_rows, 128] block DMA'd per grid step,
        # keyed by the PREFETCHED tile id (sorted cohorts make
        # consecutive blocks share slabs, so most steps skip the DMA);
        # DEAD blocks (bt == n_tiles) map to the trailing zero slab
        + [pl.BlockSpec((1, n_f * t_rows, 128),
                        lambda b, bt: (bt[b], 0, 0))]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # inverse-CDF table
        + [state_spec] * 8,
        out_specs=[state_spec] * 8
        + [pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.SMEM)],
    )
    out_shape = (
        [jax.ShapeDtypeStruct((rows_tot, 128), jnp.float32)] * 7
        + [jax.ShapeDtypeStruct((rows_tot, 128), jnp.int32)]
        + [jax.ShapeDtypeStruct((acc_rows, 128), jnp.float32),
           jax.ShapeDtypeStruct((1, 8), jnp.float32)])
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=tcfg.interpret,
    )

    def launch(par, tab, inv_packed, majs, majrow, smu, sux, suy,
               spot_fx, spot_fy, key, n_ph_in):
        x0, lx, y0, ly, z0, lz = (par[0, 0], par[0, 1], par[0, 2],
                                  par[0, 3], par[0, 4], par[0, 5])
        z_eps = lz * _TOP_EPS
        kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
        seed = (kd[0] * np.uint32(0x9E37_79B9) ^ kd[-1]).astype(jnp.int32)
        quota0 = jnp.asarray(n_ph_in, jnp.int32)

        st0 = jnp.zeros((n_pad, 7), jnp.float32)
        tile0 = jnp.full((n_pad,), DEAD, jnp.int32)
        acc0 = jnp.zeros((acc_rows, 128), jnp.float32)
        iota_n = jnp.arange(n_pad, dtype=jnp.int32)

        def top_tile(px, py):
            ixg = jnp.clip(((px - x0) * (nx / lx)).astype(jnp.int32),
                           0, nx - 1)
            iyg = jnp.clip(((py - y0) * (ny / ly)).astype(jnp.int32),
                           0, ny - 1)
            return (((ixg // tx) * np.int32(nty) + iyg // ty)
                    * np.int32(ntz) + np.int32(ntz - 1))

        def body(carry):
            (st, tile_a, acc, quota, n_started, n_alive, p_i,
             steps_acc) = carry
            # ---- inject fresh photons into dead slots (top boundary
            # sources; reference: src/monteCarloIllumination.f95:62-216)
            kq = jax.random.fold_in(key, p_i)
            us = jax.random.uniform(kq, (n_pad, 4), jnp.float32)
            dead = tile_a >= n_tiles
            rank = jnp.cumsum(dead.astype(jnp.int32))
            # cap live photons at the pool size MINUS the padding
            # reserve (n_tiles * B): the segment-padded pack can grow
            # each live set by < n_tiles * B slots, and a pack past
            # n_pad would silently drop photons
            n_live = np.int32(n_pad) - jnp.sum(dead.astype(jnp.int32))
            cap = jnp.maximum(np.int32(n_pool_r) - n_live, 0)
            take = dead & (rank <= jnp.minimum(quota, cap))
            if source_kind == illumination.SPOTLIGHT:
                fx = x0 + spot_fx * lx
                fy = y0 + spot_fy * ly
                x_new = jnp.full((n_pad,), 0.0) + fx
                y_new = jnp.full((n_pad,), 0.0) + fy
            else:
                x_new = x0 + us[:, 0] * lx
                y_new = y0 + us[:, 1] * ly
            if source_kind in (illumination.DIRECTIONAL,
                               illumination.SPOTLIGHT):
                uz_new = jnp.full((n_pad,), 0.0) - smu
                ux_new = jnp.full((n_pad,), 0.0) + sux
                uy_new = jnp.full((n_pad,), 0.0) + suy
            elif source_kind == illumination.RANDOM_AZIMUTH:
                uz_new = jnp.full((n_pad,), 0.0) - smu
                phi_n = 2.0 * np.pi * us[:, 2]
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - smu * smu))
                ux_new = s_sin * jnp.cos(phi_n)
                uy_new = s_sin * jnp.sin(phi_n)
            else:  # FLUX (global-average weighting, mu = -sqrt(u))
                mu_n = jnp.sqrt(jnp.maximum(us[:, 2], 1e-12))
                uz_new = -mu_n
                phi_n = 2.0 * np.pi * us[:, 3]
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_n * mu_n))
                ux_new = s_sin * jnp.cos(phi_n)
                uy_new = s_sin * jnp.sin(phi_n)
            fresh = jnp.stack([x_new, y_new,
                               jnp.full((n_pad,), 0.0) + z0 + lz - z_eps,
                               ux_new, uy_new, uz_new,
                               jnp.ones((n_pad,), jnp.float32)], axis=1)
            st = jnp.where(take[:, None], fresh, st)
            tile_a = jnp.where(take, top_tile(st[:, 0], st[:, 1]),
                               tile_a)
            n_inj = jnp.sum(take.astype(jnp.int32))
            quota = quota - n_inj
            n_started = n_started + n_inj

            # ---- sort into per-tile cohorts + segment-padded pack ----
            # single-operand PACKED sort: (tile << 24) | slot sorts by
            # (tile, slot) in one key array -- measured 23.9 ms vs
            # 60.6 ms for the 2-operand lax.sort at 1M lanes (the
            # bitonic network moves half the data). MAX_TILES = 127 and
            # n_pad < 2^24 make the pack exact and non-negative
            # (127 << 24 | 0xFFFFFF == INT32_MAX).
            packed = tile_a * np.int32(1 << 24) + iota_n
            sp = jax.lax.sort(packed)
            sk = jnp.right_shift(sp, 24)
            perm = jnp.bitwise_and(sp, np.int32((1 << 24) - 1))
            seg = jnp.searchsorted(
                sk, jnp.arange(n_tiles + 1, dtype=jnp.int32))
            count = seg[1:] - seg[:-1]
            pc = _ceil_j(count, B) * B
            pad_cum = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(pc)])
            t_j = jnp.searchsorted(pad_cum, iota_n, side="right") - 1
            t_jc = jnp.clip(t_j, 0, n_tiles - 1)
            local = iota_n - jnp.take(pad_cum, t_jc)
            valid = ((t_j < n_tiles)
                     & (local < jnp.take(count, t_jc)))
            src = jnp.clip(jnp.take(seg[:-1], t_jc) + local, 0,
                           n_pad - 1)
            gidx = jnp.take(perm, src)
            st_s = jnp.where(valid[:, None],
                             jnp.take(st, gidx, axis=0), 0.0)
            tile_s = jnp.where(valid, t_jc, DEAD)
            blk_start = jnp.arange(n_blocks, dtype=jnp.int32) * B
            bt_arr = jnp.minimum(
                jnp.searchsorted(pad_cum, blk_start, side="right") - 1,
                np.int32(n_tiles))

            # ---- one tiled-transport pass ----
            scal = jnp.stack([seed, p_i, jnp.int32(0),
                              jnp.int32(0)]).astype(jnp.int32)
            ins = [st_s[:, i].reshape(rows_tot, 128) for i in range(7)]
            outs = call(bt_arr, scal, par, majs, majrow, tab,
                        inv_packed, *ins,
                        tile_s.reshape(rows_tot, 128))
            st_n = jnp.stack([o.reshape(-1) for o in outs[:7]], axis=1)
            tile_n = outs[7].reshape(-1)
            acc = acc + outs[8]
            steps_acc = steps_acc + outs[9][0, 3]
            n_alive = jnp.sum((tile_n < n_tiles).astype(jnp.int32))
            return (st_n, tile_n, acc, quota, n_started, n_alive,
                    p_i + 1, steps_acc)

        drain_floor = np.int32(max(0, n_pool_r // max(tcfg.drain_div, 1)))

        def cond(carry):
            (_, _, _, quota, _, n_alive, p_i, _) = carry
            return ((quota > 0) | (n_alive > drain_floor)) & (
                p_i < tcfg.max_passes)

        carry0 = (st0, tile0, acc0, quota0, jnp.int32(0), jnp.int32(0),
                  jnp.int32(0), jnp.float32(0.0))
        (st_f, tile_f, acc_f, quota_f, n_started, n_alive, n_passes,
         steps_acc) = jax.lax.while_loop(cond, body, carry0)

        # ---- decode the tile-footprint-major tally layout ----
        a = acc_f.reshape(n_foot, ft_rows * 128)[:, :3 * f_rows * 128]
        a = a.reshape(n_foot, 3, f_rows * 128)[:, :, :foot]
        a = a.reshape(ntx, nty, 3, tx, ty)
        img = a.transpose(2, 0, 3, 1, 4).reshape(3, nx, ny)
        n_bad = n_alive
        return (img[0], img[1], img[2], n_started, n_bad, n_passes,
                steps_acc)

    return launch


def _ceil_j(a, b):
    return -(-a // b)


def run_batch_pallas_tile(domain: OpticalDomain, surface: Surface,
                          source: illumination.Source, key,
                          tcfg: TileConfig, n_pool: int,
                          n_photons, use_russian_roulette: bool = True,
                          russian_roulette_weight: float = 1.0):
    """Run one photon batch through the tiled megakernel; returns
    (flux_up, flux_down, abs_col, n_started, n_bad, n_passes, steps)."""
    grid = domain.grid
    nx, ny, nz = grid.shape
    tiles = tcfg.force_tiles or plan_for(domain)
    if tiles is None:
        raise ValueError("no tile plan for grid shape "
                         f"{grid.shape} (pallas_tile)")
    tx, ty, tz = tiles
    # crash guard: keep the grid length within the proven MAX_BLOCKS
    # envelope by widening blocks (see MAX_BLOCKS note above)
    n_tiles_p = (nx // tx) * (ny // ty) * (nz // tz)
    rows_b = guard_rows_b(tcfg.rows_b, int(n_pool), n_tiles_p)
    if rows_b != tcfg.rows_b:
        tcfg = dataclasses.replace(tcfg, rows_b=rows_b)
    tab, majs, majrow, t_rows = _obj_cache(
        domain, ("tiletab", tiles),
        lambda: _pack_tile_table(domain, tx, ty, tz))

    records = domain.cell_records
    ssa_u = records[0, 3]          # [2 + C] with C = 1
    g_u = records[0, 5]            # [2 + 3C] with C = 1
    analytic_hg = bool(domain.all_hg)
    if analytic_hg:
        inv_packed = jnp.zeros((256, 8), jnp.float32)
        inv_hp, inv_n_steps = 8, 0
    else:
        inv_packed, inv_hp, inv_n_steps = _obj_cache(
            domain, ("inv", True),
            lambda: _pack_inverse_table(domain, hif=True))
    xe, ye, ze = grid.x_edges, grid.y_edges, grid.z_edges

    def _opt(name, default):
        # no `x or default`: source fields may be TRACED scalars under
        # run_batch's jit and bool(tracer) raises
        v = getattr(source, name, None)
        return jnp.asarray(default if v is None else v, jnp.float32)

    smu = jnp.abs(_opt("solar_mu", 1.0))
    sphi = _opt("solar_azimuth", 0.0)
    sth = jnp.sqrt(jnp.maximum(0.0, 1.0 - smu ** 2))
    sux = sth * jnp.cos(sphi)
    suy = sth * jnp.sin(sphi)
    spot_fx = _opt("solar_x", 0.5)
    spot_fy = _opt("solar_y", 0.5)
    par = jnp.stack([
        xe[0], xe[-1] - xe[0], ye[0], ye[-1] - ye[0],
        ze[0], ze[-1] - ze[0],
        jnp.asarray(surface.params.reshape(-1)[0], jnp.float32),
        jnp.asarray(ssa_u, jnp.float32), jnp.asarray(g_u, jnp.float32),
        jnp.asarray(russian_roulette_weight, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 16)

    fields = tile_fields(domain)
    lkey = ("tile", (nx, ny, nz), tiles, tcfg, int(n_pool), source.kind,
            bool(use_russian_roulette), fields, domain.n_components,
            analytic_hg, int(inv_hp), int(inv_n_steps))
    launch = _TILE_LAUNCH_CACHE.get(lkey)
    if launch is None:
        launch = jax.jit(_make_tile_launch(
            (nx, ny, nz), tiles, tcfg, int(n_pool), source.kind,
            bool(use_russian_roulette), t_rows, fields=fields,
            analytic_hg=analytic_hg, inv_hp=int(inv_hp),
            inv_n_steps=int(inv_n_steps)))
        _TILE_LAUNCH_CACHE[lkey] = launch
    return launch(par, tab, inv_packed, majs, majrow, smu, sux, suy,
                  spot_fx, spot_fy, key, n_photons)


def run_batch_pallas_tile_tallies(domain, surface, source, key, config,
                                  n_photons=None,
                                  interpret: bool = False,
                                  tcfg: Optional[TileConfig] = None):
    """run_batch-compatible entry: returns a transport.integrator.Tallies."""
    from mcbrat3d_tpu.transport.integrator import Tallies

    if n_photons is None:
        n_photons = config.photons_per_batch
    # pool sizing: the batch's lane budget, block-rounded; passes stream
    # the whole pool through the kernel, so width is throughput (bigger
    # pools amortize the per-pass sort), not a per-photon cost
    if tcfg is None:
        tcfg = TileConfig(interpret=interpret)
    fu, fd, ab, n_started, n_bad, n_passes, steps = run_batch_pallas_tile(
        domain, surface, source, key, tcfg, config.n_lanes, n_photons,
        use_russian_roulette=config.use_russian_roulette,
        russian_roulette_weight=config.russian_roulette_weight)
    return Tallies(
        flux_up=fu, flux_down=fd, flux_absorbed=ab,
        volume_absorption=None, intensity=None,
        n_photons=n_started, n_bad=n_bad,
        n_steps=(n_passes * tcfg.k_steps).astype(jnp.int32),
    )
