"""Column-template Pallas megakernel: Landsat-scale domains on TPU.

The small-domain megakernel (transport/pallas_kernel.py) is bounded by its
factorized one-hot gather to <= 16384 CELLS. The reference's flagship big
scenes -- I3RC case 4 Landsat (128 x 128 columns, ~2M cells; reference:
Domain-Files/i3rcLandsatCloud.f95:27-40) -- are far past that, but their
extinction field is exactly column-templated:

    beta(x, y, z) = col_scale[col] * (iz < col_height[col])

so per-COLUMN records (<= 16384 columns) carry the whole field. This kernel
re-uses the wave/VMEM design with:

  * a BILINEAR two-one-hot gather: value[n] = oh_hi[n] . M . oh_lo[n]^T
    with col = hi * 128 + lo; step 1 is a per-sublane-row MXU dot
    (M^T [128lo, 128hi] @ ohh[:, b, :]), step 2 a batched one-hot mask +
    sublane tree-reduce, photon index in the lane dim throughout;
  * col fields: bf16 hi/lo split of col_scale (exact to ~2^-17) + integer
    col_height (bf16-exact for nz <= 128);
  * a two-level majorant over xy BLOCKS of macro_factor^2 columns: each
    block stores (max scale rounded UP in bf16, max cloud-top height).
    Jumps sample against the carried block ceiling below the block's
    cloud-top plane and advance geometrically above it, clipped at xy
    block faces and (descending) the cloud-top plane;
  * SECTIONED column tallies sharing the gather's two one-hots: flux-up /
    flux-down / column-absorption are three value-sets contracted against
    the same (hi, lo) one-hots into static row-ranges of one accumulator
    (absorption carries a bf16 hi/lo value split; exits are plain bf16 --
    they are ~2.5% of events and far under MC noise);
  * a z-profile absorption tally (one extra one-hot over iz <= 128),
    serving the reference's absorption-profile output;
  * an OPTIONAL full 3D volume-absorption tally (the reference reports
    3D absorption as a headline output; reference:
    Drivers/monteCarloDriver.f95:1324): acc3[iz*128 + hi, lo] +=
    absorbed, contracted on the MXU with a combined (z, hi) one-hot
    against the existing lo one-hot carrying exact f32 values (bf16
    value rounding would BIAS first-collision cells, whose absorbed
    values repeat exactly). Envelope nx*ny*nz <= 2M cells (<= 8 MB
    VMEM accumulator).

Eligibility: monochromatic flux(+profile) runs, one component with uniform
ssa and either a uniform HG phase (analytic sampling) or a SINGLE-entry
tabulated inverse-CDF phase (the reference Landsat case's one Mie phase
function; sampled in-kernel from the paired angle table), column-template
domains with nx*ny <= 16384 and nz <= 128, regular grid, uniform Lambertian
surface, directional/random-azimuth/flux sources (+ BBEmission with the
host-built column alias). Radiance runs additionally go through the
slab-scan in-kernel local estimation (pallas_col_intensity_eligible:
production-default Iwabuchi RR + hybrid phase, nx/ny <= 128, non-emission
sources, up to MAX_KERNEL_DIRS per pass). Reference hot loop being
replaced: Integrators/monteCarloRadiativeTransfer.f95:393-841.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.pallas_kernel import (
    MAX_KERNEL_DIRS,
    PallasConfig,
    _bf16_split,
    _grid_march_scalars,
    _hif_gather2,
    _make_uniform,
    _obj_cache,
    _pack_forward_table,
    _pack_inverse_table,
    _tally_contract_sub,
    surface_px_ok,
)

_TINY = np.float32(1e-30)
_TOP_EPS = np.float32(1e-6)
_BIG = np.float32(3e38)

MAX_COLS = 128 * 128
MAX_VOL_CELLS = 128 * 128 * 128  # 3D tally accumulator <= 8 MB VMEM


def _col_zcl_cells(domain) -> float:
    """Global max cloud-top height in CELLS (memoized host fetch)."""
    return _obj_cache(domain, ("zclmax",),
                      lambda: float(jnp.max(domain.col_height)))


def plan_col_march(grid, domain, icfg, dirs):
    """Host-side slab-scan march plan for column-kernel local estimation.

    The in-kernel march loops over the domain's PHYSICAL fast-axis slabs
    (uniform loop index -> dynamic VMEM row reads, no per-lane one-hot
    gathers; the 2D generalization of the record kernel's "colscan"
    formulation). Per direction the static facts are: the FAST axis
    (the one the ray crosses more cells of -- guaranteeing <= 1 slow-axis
    face per slab) and the wrap count W sized so slabs are scanned until
    the shallowest event (z = z0) passes the global cloud-top height
    (above it every column's closed-form CT is zero; the gas term is
    closed-form separately). Iteration count per direction = n_fast * W.

    Returns (axis_list, k_list, groups, perm) with groups a <= 4 tuple of
    (axis, k_iters, start, count) over the perm-sorted directions, or
    None when dirs are traced (callers fall back to the XLA estimator).
    """
    if icfg is None or dirs is None:
        return None
    if getattr(domain, "col_height", None) is None:
        return None
    nx, ny, nz = grid.shape
    try:
        lz, dxc, dyc = _grid_march_scalars(grid)
        d_np = np.asarray(dirs)
        hcl = min(_col_zcl_cells(domain), float(nz)) * (lz / nz)
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return None
    axes, ks = [], []
    for i in range(icfg.n_dirs):
        ux_ = float(d_np[0, i])
        uy_ = float(d_np[1, i])
        uz_ = max(float(d_np[2, i]), 1e-3)
        x_fast = abs(ux_) / dxc >= abs(uy_) / dyc
        uf, df, n_f = ((abs(ux_), dxc, nx) if x_fast
                       else (abs(uy_), dyc, ny))
        travel_cells = hcl / uz_ * uf / df
        w_wraps = int((travel_cells + 1.0) // n_f) + 1
        axes.append(0 if x_fast else 1)
        ks.append(n_f * w_wraps)
    # sort by (axis, iterations); split into <= 4 groups at axis changes
    # then at the largest bound jumps (each group runs at its max bound)
    perm = tuple(sorted(range(icfg.n_dirs),
                        key=lambda i: (axes[i], ks[i])))
    a_sorted = [axes[i] for i in perm]
    k_sorted = [ks[i] for i in perm]
    splits = [i for i in range(1, icfg.n_dirs)
              if a_sorted[i] != a_sorted[i - 1]]
    jumps = sorted((k_sorted[i] - k_sorted[i - 1], i)
                   for i in range(1, icfg.n_dirs) if i not in splits)
    for jmp, i in reversed(jumps):
        if len(splits) >= 3 or jmp <= 0:
            break
        splits.append(i)
    groups = []
    start = 0
    for end in sorted(splits) + [icfg.n_dirs]:
        groups.append((a_sorted[start], max(k_sorted[start:end]),
                       start, end - start))
        start = end
    return tuple(a_sorted), tuple(k_sorted), tuple(groups), perm


def col_intensity_ineligibility_reasons(domain, surface, source, lw_mode,
                                        record_scattering_orders,
                                        use_ray_tracing, icfg, dirs,
                                        dirs_mu_ok,
                                        need_volume_absorption) -> list:
    """Names of every failing column-kernel local-estimation predicate
    (empty = eligible)."""
    nx, ny, nz = domain.grid.shape
    reasons = []
    if not pallas_col_eligible(
            domain, surface, source, lw_mode, compute_intensity=False,
            record_scattering_orders=record_scattering_orders,
            use_ray_tracing=use_ray_tracing,
            need_volume_absorption=need_volume_absorption):
        reasons.append("column-kernel flux eligibility fails")
    if icfg is None or dirs is None:
        return reasons + ["no intensity config/dirs"]
    if icfg.n_dirs > MAX_KERNEL_DIRS:
        reasons.append(f"n_dirs={icfg.n_dirs} > {MAX_KERNEL_DIRS}")
    if not dirs_mu_ok:
        reasons.append("a direction is below the pallas_min_mu floor")
    if icfg.limit_contributions:
        reasons.append("limitIntensityContributions not in-kernel for "
                       "the column kernel")
    if icfg.n_orders_orig_phase > 0:
        reasons.append("n_orders_orig_phase > 0")
    if lw_mode or source.kind == illumination.EMISSION:
        reasons.append("LW/emission radiance not in-kernel for the "
                       "column kernel")
    if max(nx, ny) > 128:
        reasons.append("slow-axis take_along needs nx and ny <= 128")
    # phase value source: analytic HG, or a SINGLE forward table row
    use_hybrid = bool(icfg.use_hybrid_phase)
    table = (domain.tables.forward if use_hybrid
             else domain.tables.forward_orig)
    if table.shape[1] > 1 and table.shape[0] != 1:
        reasons.append("forward phase table has more than one row")
    if table.shape[1] == 1 and not domain.all_hg:
        reasons.append("no forward table and not all-HG")
    return reasons


def pallas_col_intensity_eligible(domain, surface, source, lw_mode,
                                  record_scattering_orders,
                                  use_ray_tracing, icfg, dirs,
                                  dirs_mu_ok: bool = False,
                                  need_volume_absorption: bool = False
                                  ) -> bool:
    """True when the column megakernel's in-kernel local estimation
    (slab-scan march, see plan_col_march) covers this radiance
    configuration: production-default estimator (Iwabuchi RR post-march
    decisions, hybrid/tabulated forward phase with a single row or
    analytic HG), non-emission sources, on a column-flux-eligible domain
    with nx, ny <= 128. Direction counts above MAX_KERNEL_DIRS run as
    chunked transport passes (integrator).
    Reference being served: the I3RC case-4 Landsat radiance runs
    (Domain-Files/i3rcLandsatCloud.f95:27-40,
    Drivers/monteCarloDriver.f95:61)."""
    if icfg is None or dirs is None:
        return False
    return not col_intensity_ineligibility_reasons(
        domain, surface, source, lw_mode, record_scattering_orders,
        use_ray_tracing, icfg, dirs, dirs_mu_ok, need_volume_absorption)


def pallas_col_eligible(domain: OpticalDomain, surface: Surface,
                        source: illumination.Source,
                        lw_mode: bool, compute_intensity: bool,
                        record_scattering_orders: int,
                        use_ray_tracing: bool,
                        need_volume_absorption: bool) -> bool:
    """True when the column megakernel covers this configuration exactly."""
    nx, ny, nz = domain.grid.shape
    # phase sampling: analytic HG with one uniform g, or a SINGLE-entry
    # tabulated (Mie-class) inverse-CDF table sampled in-kernel (the
    # reference Landsat case uses one Mie phase function for the whole
    # scene; reference: Domain-Files/i3rcLandsatCloud.f95:27-40)
    has_gas = domain.col_qz is not None
    if has_gas:
        # 2-comp template: the cloud's single phase entry (detection
        # enforced uniformity; the gas never scatters)
        phase_ok = (domain.col_analytic_hg
                    or domain.tables.inverse.shape[1] <= 131072)
    else:
        phase_ok = (domain.all_hg and domain.uniform_hg) or (
            domain.tables.inverse.shape[0] == 1
            and domain.tables.inverse.size <= 131072)
    # BBEmission needs the host-built column alias + cumulative-Planck
    # tables (z-uniform temps, uniform ssa, lambda_um > 0; see
    # OpticalDomain.col_em_* docs)
    em_ok = (source.kind != illumination.EMISSION
             or (source.em_prob is not None
                 and domain.col_em_prob is not None))
    # per-pixel Lambertian (surface_px_ok: pixels tile whole columns)
    # is supported for non-emission runs; surface BBEmission pre-credits
    # assume the uniform albedo
    sfc_ok = surface.is_uniform_lambertian or (
        source.kind != illumination.EMISSION
        and surface_px_ok(surface, domain.grid, lw_mode,
                      max_cols=MAX_COLS))
    return (
        bool(domain.col_template)
        and phase_ok
        and (domain.n_components == 1 or has_gas)
        and (domain.uniform_ssa or has_gas)
        and domain.grid.xy_regular and domain.grid.z_regular
        and sfc_ok
        and source.kind in (illumination.DIRECTIONAL,
                            illumination.RANDOM_AZIMUTH,
                            illumination.FLUX,
                            illumination.EMISSION)
        and em_ok
        and ((not lw_mode) or source.kind == illumination.EMISSION)
        and not compute_intensity
        and record_scattering_orders == 0
        and not use_ray_tracing
        and (not need_volume_absorption
             or nx * ny * nz <= MAX_VOL_CELLS)
        and nx * ny <= MAX_COLS
        and nz <= 128
    )


def _build_kernel_col(shape, pcfg: PallasConfig, source_kind: str,
                      use_rr: bool, macro_factor: int, nbx: int, nby: int,
                      analytic_hg: bool = True, inv_hp: int = 8,
                      inv_n_steps: int = 0, need_vol: bool = False,
                      lw: bool = False, has_gas: bool = False,
                      n_dirs: int = 0, le_groups=(),
                      use_irr: bool = False, use_fwd: bool = False,
                      fwd_hf: int = 8, fwd_n_s: int = 0, hti: int = 8,
                      has_px: bool = False):
    """Close over static shapes; returns the column-mode kernel function."""
    nx, ny, nz = shape
    rows, blk, k_steps = pcfg.rows, pcfg.block_rows, pcfg.steps_per_call
    nxy = nx * ny
    emission = source_kind == illumination.EMISSION

    part_set = frozenset(pcfg.debug_parts.split(","))
    hw_rng = (not pcfg.interpret) and "swrng" not in part_set

    def kernel(scal_ref, par_ref, dirs_ref,
               x_in, y_in, z_in, ux_in, uy_in, uz_in, w_in,
               quota_in, alive_in, bls_in, blh_in,
               mcol_ref, mblk_ref, inv_ref, ecol_ref, fcum_ref, qz_ref,
               mabx_ref, maby_ref, fwd_ref, alb_ref,
               acc_in, accz_in, acc3_in, acci_in,
               x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref, w_ref,
               quota_ref, alive_ref, bls_ref, blh_ref,
               acc_ref, accz_ref, acc3_ref, acci_ref, nstat_ref):
        k_idx = pl.program_id(0)
        b_idx = pl.program_id(1)

        @pl.when((k_idx == 0) & (b_idx == 0))
        def _init():
            for src, dst in ((x_in, x_ref), (y_in, y_ref), (z_in, z_ref),
                             (ux_in, ux_ref), (uy_in, uy_ref),
                             (uz_in, uz_ref), (w_in, w_ref),
                             (quota_in, quota_ref), (alive_in, alive_ref),
                             (bls_in, bls_ref), (blh_in, blh_ref),
                             (acc_in, acc_ref), (accz_in, accz_ref),
                             (acc3_in, acc3_ref), (acci_in, acci_ref)):
                dst[:] = src[:]
            for _j in range(8):
                nstat_ref[0, _j] = 0.0

        seed = scal_ref[0]
        step0 = scal_ref[1]
        beta_max = par_ref[0, 0]
        albedo = par_ref[0, 2]
        smu = par_ref[0, 3]
        sphi = par_ref[0, 4]
        rr_w = par_ref[0, 5]
        x0 = par_ref[0, 6]
        lx = par_ref[0, 7]
        y0 = par_ref[0, 8]
        ly = par_ref[0, 9]
        z0 = par_ref[0, 10]
        lz = par_ref[0, 11]
        ssa_u = par_ref[0, 12]
        g_u = par_ref[0, 13]
        atms_frac = par_ref[0, 16]
        inv_dx = nx / lx
        inv_dy = ny / ly
        inv_dz = nz / lz
        dz = lz / nz
        z_max = z0 + lz
        z_eps = lz * _TOP_EPS

        lane0 = (jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 0)
                 * np.uint32(128)
                 + jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 1))
        seed_u = seed.astype(jnp.uint32)

        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (blk, 128, 128), 1)
        iota_hi3 = jax.lax.broadcasted_iota(jnp.int32, (128, blk, 128), 0)

        def bilinear_multi(m_stack, ohh_bf, ohs_f32, groups):
            """Multi-field bilinear gather with ONE dot per sublane row.

            m_stack [128*F, 128hi] bf16 stacks F pre-transposed field
            tables along rows; ``groups`` lists tuples of field indices
            whose row-blocks are SUMMED before the one-hot mask + sublane
            reduce (bf16 hi/lo value splits collapse into one reduce).
            Returns one [blk, 128p] f32 per group.
            """
            gs = [jnp.dot(m_stack, ohh_bf[:, b_i, :],
                          preferred_element_type=jnp.float32)
                  for b_i in range(blk)]
            g3 = jnp.stack(gs, axis=0)  # [blk, 128*F, 128p] f32
            outs = []
            for grp in groups:
                acc = g3[:, grp[0] * 128:(grp[0] + 1) * 128, :]
                for f_i in grp[1:]:
                    acc = acc + g3[:, f_i * 128:(f_i + 1) * 128, :]
                outs.append(jnp.sum(acc * ohs_f32, axis=1))
            return outs

        def block_step(b, ctr_i32, started):
            ctr = ctr_i32.astype(jnp.uint32)
            sl = pl.ds(b * blk, blk)
            if hw_rng:
                pltpu.prng_seed(seed, ctr_i32 * np.int32(rows // blk) + b)

                def uniform(counter, site):
                    del counter, site
                    bits = pltpu.prng_random_bits((blk, 128))
                    ub = pltpu.bitcast(bits, jnp.uint32) >> np.uint32(8)
                    x24 = jax.lax.bitcast_convert_type(ub, jnp.int32)
                    return (x24.astype(jnp.float32)
                            * np.float32(2.0 ** -24))
            else:
                uniform = _make_uniform(
                    lane0 + np.uint32(blk * 128) * b.astype(jnp.uint32),
                    seed_u)

            x, y, z = x_ref[sl], y_ref[sl], z_ref[sl]
            ux, uy, uz = ux_ref[sl], uy_ref[sl], uz_ref[sl]
            w = w_ref[sl]
            alive = alive_ref[sl] > 0
            quota = quota_ref[sl]
            bls = bls_ref[sl]  # carried block majorant (scale)
            blh = blh_ref[sl]  # carried block cloud-top height [cells]

            # ---- refill dead lanes from the source ----
            need = (~alive) & (quota > 0)
            u0 = uniform(ctr, 0)
            u1 = uniform(ctr, 1)
            atm_emit = None
            col_b = z_b = None
            if emission:
                # column-template BBEmission: column Walker alias (ONE
                # 6-field bilinear gather -- the alias TARGET's height is
                # a precomputed field, so no second gather) + z from the
                # cumulative-Planck table truncated at the column height.
                # Reference sampling being replaced:
                # src/monteCarloIllumination.f95:495-498 (3-level scan).
                u_split = uniform(ctr, 10)
                u_bin = uniform(ctr, 11)
                u_acc = uniform(ctr, 12)
                u_mu = uniform(ctr, 13)
                u_zo = uniform(ctr, 14)
                u_phi_e = uniform(ctr, 15)
                u_zt = uniform(ctr, 16)
                from_atm = u_split < atms_frac
                jbin = jnp.minimum((u_bin * np.float32(nxy)).astype(
                    jnp.int32), np.int32(nxy - 1))
                lo_e = jnp.bitwise_and(jbin, 127)
                hi_e = jnp.right_shift(jbin, 7)
                ohs_e = (lo_e[:, None, :] == iota_sub).astype(jnp.float32)
                ohh_e = (iota_hi3 == hi_e[None, :, :]).astype(jnp.bfloat16)
                p_j, a_j, h_d, h_a = bilinear_multi(
                    ecol_ref[:], ohh_e, ohs_e,
                    groups=((0, 1), (2, 3), (4,), (5,)))
                redirect = u_acc >= p_j
                col_b = jnp.where(redirect, (a_j + 0.5).astype(jnp.int32),
                                  jbin)
                h_b = jnp.where(redirect, h_a, h_d)
                # z | col: z = #{k: Fcum[k] <= u * Fcum[h-1]} (Fcum padded
                # with _BIG past nz so the counts stay in range)
                hz = jnp.clip(h_b.astype(jnp.int32) - 1, 0, nz - 1)
                f_row = fcum_ref[0]  # [128]
                cmp_h = (hz[:, None, :] == iota_sub).astype(jnp.float32)
                f_h = jnp.sum(cmp_h * f_row[None, :, None], axis=1)
                target = u_zt * f_h
                z_b = jnp.sum(
                    (f_row[None, :, None] <= target[:, None, :]).astype(
                        jnp.float32), axis=1).astype(jnp.int32)
                colf = col_b.astype(jnp.float32)
                ixf = jnp.floor((colf + 0.5) * np.float32(1.0 / ny))
                iyf = colf - ixf * ny
                xa = x0 + (ixf + u0) * (lx / nx)
                ya = y0 + (iyf + u1) * (ly / ny)
                za = jnp.clip(z0 + (z_b.astype(jnp.float32) + u_zo) * dz,
                              z0 + z_eps, z_max - z_eps)
                mu_a = 1.0 - 2.0 * u_mu
                mu_a = jnp.where(jnp.abs(mu_a) < 1e-4,
                                 jnp.sign(mu_a + _TINY) * 1e-4, mu_a)
                mu_sfc = jnp.sqrt(jnp.maximum(u_mu, np.float32(1e-12)))
                s_mu = jnp.where(from_atm, mu_a, mu_sfc)
                x = jnp.where(need, jnp.where(from_atm, xa, x0 + u0 * lx),
                              x)
                y = jnp.where(need, jnp.where(from_atm, ya, y0 + u1 * ly),
                              y)
                z = jnp.where(need, jnp.where(from_atm, za, z0 + z_eps), z)
                s_phi = 2.0 * np.pi * u_phi_e
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - s_mu * s_mu))
                sux = s_sin * jnp.cos(s_phi)
                suy = s_sin * jnp.sin(s_phi)
                atm_emit = need & from_atm
            else:
                x = jnp.where(need, x0 + u0 * lx, x)
                y = jnp.where(need, y0 + u1 * ly, y)
                z = jnp.where(need, z_max - z_eps, z)
            if emission:
                pass
            elif source_kind == illumination.DIRECTIONAL:
                # constant beam: host-precomputed cosines (params 14/15)
                s_mu = -smu
                sux = jnp.broadcast_to(par_ref[0, 14], (blk, 128))
                suy = jnp.broadcast_to(par_ref[0, 15], (blk, 128))
            elif source_kind == illumination.RANDOM_AZIMUTH:
                s_mu = -smu
                s_phi = 2.0 * np.pi * uniform(ctr, 2)
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - s_mu * s_mu))
                sux = s_sin * jnp.cos(s_phi)
                suy = s_sin * jnp.sin(s_phi)
            else:  # FLUX
                s_mu = -jnp.sqrt(jnp.maximum(uniform(ctr, 2),
                                             np.float32(1e-12)))
                s_phi = 2.0 * np.pi * uniform(ctr, 9)
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - s_mu * s_mu))
                sux = s_sin * jnp.cos(s_phi)
                suy = s_sin * jnp.sin(s_phi)
            ux = jnp.where(need, sux, ux)
            uy = jnp.where(need, suy, uy)
            uz = jnp.where(need, jnp.broadcast_to(s_mu, (blk, 128)), uz)
            w = jnp.where(need, 1.0, w)
            alive = alive | need
            quota = quota - need.astype(jnp.int32)
            started = started + jnp.sum(need.astype(jnp.float32))
            # fresh photons carry the (always valid) global ceiling
            bls = jnp.where(need, beta_max, bls)
            blh = jnp.where(need, jnp.float32(nz), blh)

            # ---- Woodcock jump against the carried block ceiling ----
            u_tau = uniform(ctr, 3)
            tau = -jnp.log1p(-u_tau)
            ztop_m = z0 + blh * dz  # block cloud-top plane
            above = z >= ztop_m
            if has_gas:
                # gas everywhere: the above-cloud region samples against
                # the gas maximum instead of advancing geometrically
                qg = par_ref[0, 17]
                ceiling = jnp.where(above, qg, bls + qg)
            else:
                ceiling = jnp.where(above, 0.0, bls)
            d_samp = jnp.where(ceiling > 0,
                               tau / jnp.where(ceiling == 0, 1.0, ceiling),
                               _BIG)
            if macro_factor > 0:
                bx_w = lx / nx * macro_factor
                by_w = ly / ny * macro_factor
                clip_nudge = 1e-5 * jnp.minimum(bx_w, by_w)
                # faces CLAMPED to the domain edge: with nx/ny not
                # divisible by macro_factor the last partial block's
                # outer face is VIRTUAL (past the periodic seam); an
                # unclamped jump would cross the wrap into a block whose
                # scale can exceed the carried majorant (systematic
                # under-attenuation along the seam)
                fx = jnp.clip((jnp.floor((x - x0) / bx_w)
                               + (ux >= 0)) * bx_w, 0.0, lx)
                fy = jnp.clip((jnp.floor((y - y0) / by_w)
                               + (uy >= 0)) * by_w, 0.0, ly)
                tx = fx + x0 - x
                ty = fy + y0 - y
                tx = jnp.where(jnp.abs(ux) > 1e-12,
                               tx / jnp.where(ux == 0, 1.0, ux), _BIG)
                ty = jnp.where(jnp.abs(uy) > 1e-12,
                               ty / jnp.where(uy == 0, 1.0, uy), _BIG)
                # descending into the cloud region: the zero ceiling is
                # only valid above the plane
                tz = jnp.where(above & (uz < -1e-12),
                               (ztop_m - z) / jnp.where(uz == 0, 1.0, uz),
                               _BIG)
                t_raw = jnp.minimum(jnp.minimum(tx, ty), tz)
                # a photon exactly ON an outward face takes one
                # global-ceiling step instead (its carried block values
                # may belong to the block it is leaving)
                escape = t_raw <= 0.0
                bls = jnp.where(escape, beta_max, bls)
                blh = jnp.where(escape, jnp.float32(nz), blh)
                ceiling = jnp.where(escape, beta_max, ceiling)
                d_samp = jnp.where(escape, tau / beta_max, d_samp)
                t_clip = jnp.where(escape, _BIG, t_raw + clip_nudge)
                clipped = t_clip < d_samp
                d = jnp.minimum(d_samp, t_clip)
            else:
                clipped = jnp.zeros((blk, 128), bool)
                d = jnp.where(ceiling > 0, d_samp, _BIG)
            zn = z + uz * d
            exit_top = alive & (zn >= z_max)
            exit_bot = alive & ~exit_top & (zn <= z0)
            moved = alive & ~exit_top & ~exit_bot
            collide = moved & ~clipped

            # boundary crossing column (exit tallies + reflection)
            z_b = jnp.where(exit_top, z_max, z0)
            safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
            t_b = (z_b - z) / safe_uz
            xe = x0 + jnp.mod(x + ux * t_b - x0, lx)
            ye = y0 + jnp.mod(y + uy * t_b - y0, ly)
            ixe = jnp.clip(((xe - x0) * inv_dx).astype(jnp.int32), 0, nx - 1)
            iye = jnp.clip(((ye - y0) * inv_dy).astype(jnp.int32), 0, ny - 1)
            col_e = ixe * ny + iye

            # collision column / level
            xc = x0 + jnp.mod(x + ux * d - x0, lx)
            yc = y0 + jnp.mod(y + uy * d - y0, ly)
            zc = jnp.clip(zn, z0, z_max)
            ix = jnp.clip(((xc - x0) * inv_dx).astype(jnp.int32), 0, nx - 1)
            iy = jnp.clip(((yc - y0) * inv_dy).astype(jnp.int32), 0, ny - 1)
            iz = jnp.clip(((zc - z0) * inv_dz).astype(jnp.int32), 0, nz - 1)
            col = ix * ny + iy

            exits = exit_top | exit_bot
            colT = jnp.where(exits, col_e, col)

            u_col = uniform(ctr, 4)
            u_ang = uniform(ctr, 5)
            u_phi = uniform(ctr, 6)
            phi_rot = 2.0 * np.pi * u_phi

            # ---- shared one-hots (gather AND tally) ----
            lo_c = jnp.bitwise_and(colT, 127)
            hi_c = jnp.right_shift(colT, 7)
            cmp_lo = lo_c[:, None, :] == iota_sub
            ohs_f32 = cmp_lo.astype(jnp.float32)   # [blk, lo, p]
            ohs_bf = cmp_lo.astype(jnp.bfloat16)
            ohh_bf = (iota_hi3 == hi_c[None, :, :]).astype(
                jnp.bfloat16)                       # [hi, blk, p]

            # ---- column gather: scale (split summed in-gather) + height
            scale, height = bilinear_multi(
                mcol_ref[:], ohh_bf, ohs_f32, groups=((0, 1), (2,)))
            beta_c = jnp.where(iz.astype(jnp.float32) < height, scale,
                               0.0)
            if has_gas:
                # horizontally uniform gas profile at the collision level
                iota_qz = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, 128, 128), 1)
                q_z = jnp.sum(
                    (iz[:, None, :] == iota_qz).astype(jnp.float32)
                    * qz_ref[0][None, :, None], axis=1)
                beta = beta_c + q_z
            else:
                beta = beta_c

            # ---- block-majorant gather at the destination ----
            if macro_factor > 0:
                bidx = ((ix // macro_factor) * nby + iy // macro_factor)
                blo = jnp.bitwise_and(bidx, 127)
                bhi = jnp.right_shift(bidx, 7)
                cmp_blo = blo[:, None, :] == iota_sub
                obs_f32 = cmp_blo.astype(jnp.float32)
                obh_bf = (iota_hi3 == bhi[None, :, :]).astype(jnp.bfloat16)
                g_bs, g_bh = bilinear_multi(
                    mblk_ref[:], obh_bf, obs_f32, groups=((0,), (1,)))
                bls = jnp.where(moved, g_bs, bls)
                blh = jnp.where(moved, g_bh, blh)

            # null-collision test against the ceiling this jump sampled
            real = collide & (u_col * ceiling < beta)
            if has_gas:
                # non-analog absorption by the cell's EFFECTIVE ssa: the
                # gas is a pure absorber, so scattering power is
                # beta_cloud * ssa_cloud (and scattering, when it
                # happens, is always the cloud's phase function)
                ssa_eff = jnp.where(
                    beta > 0,
                    beta_c * ssa_u / jnp.where(beta == 0, 1.0, beta),
                    0.0)
            else:
                ssa_eff = ssa_u
            absorbed = jnp.where(real, w * (1.0 - ssa_eff), 0.0)
            w = jnp.where(real, w * ssa_eff, w)
            # post-absorption, pre-roulette weight: the local-estimation
            # scattering contribution uses exactly this value (reference:
            # Integrators/monteCarloRadiativeTransfer.f95:776-790)
            w_int = w

            # ---- Russian roulette ----
            if use_rr:
                u_rr = uniform(ctr, 7)
                play = real & (w < 0.5 * rr_w)
                survive = u_rr < w / rr_w
                w = jnp.where(play, jnp.where(survive, rr_w, 0.0), w)
            died_weight = real & (w <= _TINY)

            # ---- scattering: analytic HG (uniform g) or single-row
            # tabulated inverse-CDF angle lookup (Mie-class phase) ----
            scatter = real & ~died_weight
            if analytic_hg:
                g_hg = g_u
                g_safe = jnp.where(jnp.abs(g_hg) < 1e-5, 1.0, g_hg)
                s_ = (1.0 - g_hg * g_hg) / (1.0 - g_hg
                                            + 2.0 * g_hg * u_ang)
                ct = (1.0 + g_hg * g_hg - s_ * s_) / (2.0 * g_safe)
                cos_theta = jnp.where(jnp.abs(g_hg) < 1e-5,
                                      2.0 * u_ang - 1.0,
                                      jnp.clip(ct, -1.0, 1.0))
            else:
                # row 0 of the stacked inverse table, hi-first layout
                # ([256, hp] f32 transposed -- pallas_kernel._hif_gather2;
                # reference: computeScatteringAngle,
                # Integrators/monteCarloRadiativeTransfer.f95:1594-1621)
                t_u = u_ang * np.float32(inv_n_steps - 1)
                k_i = jnp.clip(t_u.astype(jnp.int32), 0, inv_n_steps - 2)
                frac_i = t_u - k_i.astype(jnp.float32)
                lo_i = jnp.bitwise_and(k_i, 127)
                hi_i = jnp.right_shift(k_i, 7)
                a0, dd = _hif_gather2(inv_ref, inv_hp, hi_i, lo_i, blk)
                angle = a0 + frac_i * dd
                cos_theta = jnp.cos(angle)
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
                           jnp.sign(jnp.where(oz == 0, 1.0, oz)) * 1e-4, oz)
            inv_norm = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)
            # incoming direction at the event (scatter lanes rotate next;
            # reflected lanes keep it until the surface section) -- the
            # LE phase value needs cos(scatter angle) against it
            ux_in0, uy_in0, uz_in0 = ux, uy, uz
            ux = jnp.where(scatter, ox * inv_norm, ux)
            uy = jnp.where(scatter, oy * inv_norm, uy)
            uz = jnp.where(scatter, oz * inv_norm, uz)

            # ---- Lambertian surface reflection ----
            w_down = w
            if has_px:
                # Per-pixel Lambertian: the albedo grid divides the
                # domain columns evenly (surface_px_ok), packed per
                # COLUMN as a bf16 hi/lo split ([256, 128] M^T blocks)
                # and gathered with the SHARED event one-hots (colT is
                # the exit column for exit lanes); the split
                # reconstructs the f32 albedo to ~1 ulp. Reference
                # fractional surface lookup being reproduced:
                # src/surfaceProperties.f95:119-147.
                alb_px = bilinear_multi(alb_ref[:], ohh_bf, ohs_f32,
                                        groups=((0, 1),))[0]
                w_refl = w_down * alb_px
            else:
                w_refl = w_down * albedo
            died_surface = exit_bot & (w_refl <= _TINY)
            reflected = exit_bot & ~died_surface
            mu_new = jnp.sqrt(jnp.maximum(u_ang, np.float32(1e-12)))
            sin_new = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_new * mu_new))
            x = jnp.where(exit_bot, xe, jnp.where(moved, xc, x))
            y = jnp.where(exit_bot, ye, jnp.where(moved, yc, y))
            z = jnp.where(exit_bot, z0 + z_eps, jnp.where(moved, zc, z))
            ux = jnp.where(reflected, sin_new * jnp.cos(phi_rot), ux)
            uy = jnp.where(reflected, sin_new * jnp.sin(phi_rot), uy)
            uz = jnp.where(reflected, mu_new, uz)
            w = jnp.where(reflected, w_refl, w)
            # reflected photons restart with the global ceiling
            bls = jnp.where(exit_bot, beta_max, bls)
            blh = jnp.where(exit_bot, jnp.float32(nz), blh)

            alive = alive & ~exit_top & ~died_weight & ~died_surface

            # ---- in-kernel local estimation (radiance): slab-scan march
            # Per direction, loop over the domain's PHYSICAL fast-axis
            # slabs (uniform index -> dynamic VMEM row read) x W wraps;
            # within a slab the ray crosses at most ONE slow-axis face
            # (the fast axis is chosen so |u_slow|*dt_slab <= d_slow), so
            # per iteration the column data is 4 per-lane take_alongs of
            # the slab's [<=128] rows -- no one-hot gathers, no MXU. The
            # per-column slant optical depth is closed-form from
            # CT(z) = max(0, A - B z) with A = scale*z_cloudtop,
            # B = scale (column-template extinction); the horizontally
            # uniform gas term is closed-form from the cumulative qz
            # profile. The 2D generalization of the record kernel's
            # "colscan" formulation (reference being replaced:
            # computeIntensityContribution,
            # Integrators/monteCarloRadiativeTransfer.f95:1623-1832).
            if n_dirs > 0 and "noint" not in part_set:
                ev = real | reflected
                sx_e = jnp.where(reflected, xe, xc)
                sy_e = jnp.where(reflected, ye, yc)
                sz_e = jnp.where(reflected, z0 + z_eps, zc)
                w_ev = jnp.where(reflected, w_refl, w_int)
                nxf_le = np.float32(nx)
                nyf_le = np.float32(ny)
                dxc_le = lx / nx
                dyc_le = ly / ny
                zeta = par_ref[0, 18]
                nde_le = np.float32(1e-4)
                iota_sub_e = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, 128, 128), 1)

                def _imod(k, n):
                    m = jax.lax.rem(k, np.int32(n))
                    return m + (m < 0).astype(jnp.int32) * np.int32(n)

                def le_one_direction(d_i, axis, k_g):
                    ddx = dirs_ref[0, d_i]
                    ddy = dirs_ref[1, d_i]
                    ddz = dirs_ref[2, d_i]  # > 0 by eligibility
                    cosb = ux_in0 * ddx + uy_in0 * ddy + uz_in0 * ddz
                    if use_fwd:
                        # single-row forward phase table resampled
                        # uniform in s = sin(theta/2) (hi-first layout;
                        # see pallas_kernel._pack_forward_table)
                        s_v = jnp.sqrt(jnp.maximum(
                            (1.0 - cosb) * 0.5, 0.0))
                        tpos = s_v * np.float32(fwd_n_s - 1)
                        k_f = jnp.clip(tpos.astype(jnp.int32), 0,
                                       fwd_n_s - 2)
                        frac_f = tpos - k_f.astype(jnp.float32)
                        lo_f = jnp.bitwise_and(k_f, 127)
                        hi_f = jnp.right_shift(k_f, 7)
                        v0, dd_f = _hif_gather2(fwd_ref, fwd_hf,
                                                hi_f, lo_f, blk)
                        pv = v0 + frac_f * dd_f
                    else:
                        q_hg = jnp.maximum(
                            1.0 + g_u * g_u - 2.0 * g_u * cosb, 1e-12)
                        pv = (1.0 - g_u * g_u) / (q_hg * jnp.sqrt(q_hg))
                    npf = jnp.where(reflected, np.float32(1.0 / np.pi),
                                    pv / (4.0 * np.pi * ddz))
                    if use_irr:
                        # Iwabuchi RR thresholds (post-march decisions;
                        # same math as pallas_kernel.le_one_direction,
                        # reference: Integrators/
                        # monteCarloRadiativeTransfer.f95:1753-1813)
                        u_i1 = uniform(ctr, 32 + 2 * d_i)
                        u_itf = uniform(ctr, 33 + 2 * d_i)
                        tau_free = -jnp.log1p(-u_itf)
                        npf_pi = np.float32(np.pi) * npf
                        small_c = npf_pi <= zeta
                        tau_max = -jnp.log(
                            zeta / jnp.maximum(npf_pi, _TINY))

                    # slab-scan geometry (axis static per group)
                    if axis == 0:
                        uf, us = ddx, ddy
                        f0, s0c = sx_e, sy_e
                        fo, so = x0, y0
                        inv_df, inv_ds = inv_dx, inv_dy
                        d_f, d_s = dxc_le, dyc_le
                        n_f, n_s2 = nx, ny
                        nf_f = nxf_le
                        mab_ref = mabx_ref
                    else:
                        uf, us = ddy, ddx
                        f0, s0c = sy_e, sx_e
                        fo, so = y0, x0
                        inv_df, inv_ds = inv_dy, inv_dx
                        d_f, d_s = dyc_le, dxc_le
                        n_f, n_s2 = ny, nx
                        nf_f = nyf_le
                        mab_ref = maby_ref
                    sgn_f = jnp.where(uf >= 0.0, 1.0, -1.0)
                    sgn_s = jnp.where(us >= 0.0, 1.0, -1.0)
                    us_safe = jnp.where(jnp.abs(us) > 1e-12, us, 1.0)
                    sfrac = jnp.mod((f0 - fo) * inv_df, nf_f)
                    sig0 = sgn_f * sfrac
                    slope_t = d_f / jnp.maximum(jnp.abs(uf),
                                                np.float32(1e-12))
                    t_top = (z_max - sz_e) / ddz

                    def slab_body(it, tau):
                        cc = jax.lax.rem(it, np.int32(n_f))
                        wf = (it // np.int32(n_f)).astype(jnp.float32)
                        af = jnp.where(sgn_f > 0.0, cc.astype(jnp.float32),
                                       np.float32(n_f - 1)
                                       - cc.astype(jnp.float32))
                        # first unwrapped fast cell j == af (mod n_f)
                        # with j + 1 > sig0 (colscan residue form), then
                        # wraps shift by n_f
                        q = jnp.floor((sig0 - 1.0 - af)
                                      * np.float32(1.0 / n_f)) + 1.0
                        j = af + nf_f * (q + wf)
                        t_in = jnp.clip(jnp.maximum(j - sig0, 0.0)
                                        * slope_t, 0.0, t_top)
                        t_out = jnp.clip((j + 1.0 - sig0) * slope_t,
                                         0.0, t_top)
                        rows2 = mab_ref[pl.ds(2 * cc, 2)]
                        a_row = jnp.broadcast_to(rows2[0:1, :],
                                                 (blk, 128))
                        b_row = jnp.broadcast_to(rows2[1:2, :],
                                                 (blk, 128))
                        # slow coordinate (unwrapped); index-space nudges
                        # assign face landings to the cell entered (in)
                        # / occupied (out)
                        su_in = s0c + us * t_in
                        su_out = s0c + us * t_out
                        fy_in = jnp.floor((su_in - so) * inv_ds
                                          + sgn_s * nde_le)
                        fy_out = jnp.floor((su_out - so) * inv_ds
                                           - sgn_s * nde_le)
                        iy_in = _imod(fy_in.astype(jnp.int32), n_s2)
                        iy_out = _imod(fy_out.astype(jnp.int32), n_s2)
                        # split at the single slow face between them
                        sb = (fy_in + (us >= 0.0)) * d_s + so
                        t_s = jnp.where(jnp.abs(us) > 1e-12,
                                        (sb - s0c) / us_safe, _BIG)
                        ts = jnp.clip(t_s, t_in, t_out)
                        a1 = jnp.take_along_axis(a_row, iy_in, axis=1)
                        b1 = jnp.take_along_axis(b_row, iy_in, axis=1)
                        a2 = jnp.take_along_axis(a_row, iy_out, axis=1)
                        b2 = jnp.take_along_axis(b_row, iy_out, axis=1)
                        z_a = sz_e + ddz * t_in
                        z_s = sz_e + ddz * ts
                        z_b = sz_e + ddz * t_out

                        def ct(a_, b_, zz):
                            return jnp.maximum(a_ - b_ * zz, 0.0)

                        seg = (ct(a1, b1, z_a) - ct(a1, b1, z_s)
                               + ct(a2, b2, z_s) - ct(a2, b2, z_b))
                        return tau + seg

                    # fixed fori, NO block-level Iwabuchi early-exit
                    # while: measured 19.2 vs 28.6 k/s on the Landsat
                    # scene (the any() reduce + broken loop pipelining
                    # cost more than the rare all-lane exits buy -- a
                    # straggler lane in every 4096-lane block keeps the
                    # scan running; dead end, round 5)
                    tau_cl = jax.lax.fori_loop(
                        0, k_g, slab_body,
                        jnp.zeros((blk, 128), jnp.float32))
                    tau_f = tau_cl / ddz
                    if has_gas:
                        # horizontally uniform gas: closed-form vertical
                        # optical depth to TOA from the cumulative
                        # profile (qz_ref row 1 = Qcb[k] = sum_{j>=k}
                        # qz[j]*dz; subtract the partial bottom cell)
                        kz_g = jnp.clip(((sz_e - z0) * inv_dz).astype(
                            jnp.int32), 0, nz - 1)
                        qz_row = jnp.broadcast_to(qz_ref[0:1, :],
                                                  (blk, 128))
                        qcb_row = jnp.broadcast_to(qz_ref[1:2, :],
                                                   (blk, 128))
                        q_k = jnp.take_along_axis(qz_row, kz_g, axis=1)
                        qcb_k = jnp.take_along_axis(qcb_row, kz_g, axis=1)
                        z_bot = z0 + kz_g.astype(jnp.float32) * dz
                        tau_f = tau_f + (qcb_k - q_k * (sz_e - z_bot)
                                         ) / ddz
                    # every scan completes (no truncation): hit = ev
                    hit = ev
                    if use_irr:
                        w_rrc = w_ev * zeta * np.float32(1.0 / np.pi)
                        esc_a = hit & (tau_f < tau_free)
                        c_a = jnp.where(esc_a & (u_i1 * zeta <= npf_pi),
                                        w_rrc, 0.0)
                        esc_b = hit & (tau_f < tau_max)
                        c_b = jnp.where(
                            esc_b, w_ev * npf * jnp.exp(-tau_f),
                            jnp.where(hit & (tau_f - tau_max < tau_free),
                                      w_rrc, 0.0))
                        contrib = jnp.where(small_c, c_a, c_b)
                    else:
                        contrib = jnp.where(
                            hit, w_ev * npf * jnp.exp(-tau_f), 0.0)
                    # TOA exit pixel (closed form)
                    exf_x = jnp.mod((sx_e + ddx * t_top - x0) * inv_dx
                                    + jnp.sign(ddx) * nde_le, nxf_le)
                    exf_y = jnp.mod((sy_e + ddy * t_top - y0) * inv_dy
                                    + jnp.sign(ddy) * nde_le, nyf_le)
                    ex_col = (jnp.clip(exf_x.astype(jnp.int32), 0, nx - 1)
                              * ny
                              + jnp.clip(exf_y.astype(jnp.int32), 0,
                                         ny - 1))
                    hi_e = jnp.right_shift(ex_col, 7)
                    lo_e = jnp.bitwise_and(ex_col, 127)
                    ohs_le = (lo_e[:, None, :] == iota_sub_e).astype(
                        jnp.bfloat16)
                    iout = _tally_contract_sub(ohs_le, hi_e, contrib,
                                               hti)
                    r0 = d_i * hti
                    acci_ref[pl.ds(r0, hti)] = (
                        acci_ref[pl.ds(r0, hti)] + iout)

                for (g_axis, g_k, g_start, g_count) in le_groups:
                    jax.lax.fori_loop(
                        g_start, g_start + g_count,
                        lambda d_i, _, a_=g_axis, k_=g_k: (
                            le_one_direction(d_i, a_, k_), 0)[1],
                        0)

            x_ref[sl], y_ref[sl], z_ref[sl] = x, y, z
            ux_ref[sl], uy_ref[sl], uz_ref[sl] = ux, uy, uz
            w_ref[sl] = w
            quota_ref[sl] = quota
            alive_ref[sl] = alive.astype(jnp.int32)
            bls_ref[sl] = bls
            blh_ref[sl] = blh

            # ---- sectioned column tallies (shared one-hots) ----
            # acc rows [0:128] flux-up, [128:256] flux-down,
            # [256:384] column absorption (hi/lo value split).
            dn_t = (((1,), (1,)), ((), ()))

            v_up = jnp.where(exit_top, w, 0.0)
            v_dn = jnp.where(exit_bot, w_down, 0.0)
            ab_h, ab_l = _bf16_split(absorbed)
            # one concatenated A (all four value sets) -> ONE A.B^T dot
            # per sublane row instead of four
            a_all = jnp.concatenate([
                ohh_bf * v_up.astype(jnp.bfloat16)[None, :, :],
                ohh_bf * v_dn.astype(jnp.bfloat16)[None, :, :],
                ohh_bf * ab_h[None, :, :],
                ohh_bf * ab_l[None, :, :],
            ], axis=0)  # [512, blk, p]
            t_out = None
            for b_i in range(blk):
                d_ = jax.lax.dot_general(
                    a_all[:, b_i, :], ohs_bf[b_i], dn_t,
                    preferred_element_type=jnp.float32)
                t_out = d_ if t_out is None else t_out + d_
            acc_ref[0:256] = acc_ref[0:256] + t_out[0:256]
            acc_ref[256:384] = (acc_ref[256:384] + t_out[256:384]
                                + t_out[384:512])

            # ---- z-profile absorption tally ----
            ohz_bf = (iz[:, None, :] == iota_sub).astype(jnp.bfloat16)
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (8, blk, 128), 0)
            az_h = jnp.where(iota_r == 0, ab_h[None, :, :],
                             jnp.bfloat16(0))
            az_l = jnp.where(iota_r == 0, ab_l[None, :, :],
                             jnp.bfloat16(0))
            zout = None
            for b_i in range(blk):
                d_ = (jax.lax.dot_general(az_h[:, b_i, :], ohz_bf[b_i],
                                          dn_t,
                                          preferred_element_type=jnp.float32)
                      + jax.lax.dot_general(az_l[:, b_i, :], ohz_bf[b_i],
                                            dn_t,
                                            preferred_element_type=jnp.float32))
                zout = d_ if zout is None else zout + d_
            accz_ref[:] = accz_ref[:] + zout

            if lw and emission:
                # ---- LW emission pre-credits (-1 at the birth column and
                # level; flux-divergence accounting, reference:
                # Integrators/monteCarloRadiativeTransfer.f95:504-508) ----
                val_e = jnp.where(atm_emit, np.float32(-1.0),
                                  0.0).astype(jnp.bfloat16)
                lo_b2 = jnp.bitwise_and(col_b, 127)
                hi_b2 = jnp.right_shift(col_b, 7)
                cmp_b2 = lo_b2[:, None, :] == iota_sub
                ohs_b2 = cmp_b2.astype(jnp.bfloat16)
                ohh_b2 = (iota_hi3 == hi_b2[None, :, :]).astype(
                    jnp.bfloat16)
                a_e = ohh_b2 * val_e[None, :, :]
                e_out = None
                for b_i in range(blk):
                    d_ = jax.lax.dot_general(
                        a_e[:, b_i, :], ohs_b2[b_i], dn_t,
                        preferred_element_type=jnp.float32)
                    e_out = d_ if e_out is None else e_out + d_
                acc_ref[256:384] = acc_ref[256:384] + e_out
                # z-profile pre-credit -> accz row 1 (-1 is bf16-exact)
                ohz_b = (z_b[:, None, :] == iota_sub).astype(jnp.bfloat16)
                az_e = jnp.where(iota_r == 1, val_e[None, :, :],
                                 jnp.bfloat16(0))
                ze_out = None
                for b_i in range(blk):
                    d_ = jax.lax.dot_general(
                        az_e[:, b_i, :], ohz_b[b_i], dn_t,
                        preferred_element_type=jnp.float32)
                    ze_out = d_ if ze_out is None else ze_out + d_
                accz_ref[:] = accz_ref[:] + ze_out
                if need_vol:
                    czh_b = z_b * np.int32(128) + hi_b2
                    iota_zb = jax.lax.broadcasted_iota(
                        jnp.int32, (nz * 128, 128), 0)
                    v3e = None
                    val_ef = val_e.astype(jnp.float32)
                    for b_i in range(blk):
                        a3 = (iota_zb == czh_b[b_i][None, :]).astype(
                            jnp.float32)
                        b3 = (cmp_b2[b_i].astype(jnp.float32)
                              * val_ef[b_i][None, :])
                        d_ = jax.lax.dot_general(
                            a3, b3, dn_t,
                            preferred_element_type=jnp.float32)
                        v3e = d_ if v3e is None else v3e + d_
                    acc3_ref[:] = acc3_ref[:] + v3e

            if need_vol:
                # ---- full 3D volume-absorption tally ----
                # acc3[iz*128 + hi, lo] += absorbed. A is a combined
                # (z, hi) one-hot built with ONE iota compare; B puts the
                # EXACT f32 value on the lo one-hot (bf16 value rounding
                # would bias first-collision cells, whose absorbed values
                # repeat bit-identically). Exit lanes land on some row but
                # carry absorbed == 0 -- no masking needed. Reference
                # output being served: Drivers/monteCarloDriver.f95:1324.
                czh = iz * np.int32(128) + hi_c
                iota_z3 = jax.lax.broadcasted_iota(
                    jnp.int32, (nz * 128, 128), 0)
                v3 = None
                for b_i in range(blk):
                    a3 = (iota_z3 == czh[b_i][None, :]).astype(jnp.float32)
                    b3 = ohs_f32[b_i] * absorbed[b_i][None, :]
                    d_ = jax.lax.dot_general(
                        a3, b3, dn_t, preferred_element_type=jnp.float32)
                    v3 = d_ if v3 is None else v3 + d_
                acc3_ref[:] = acc3_ref[:] + v3

            return started

        started = block_step(b_idx, step0 + k_idx, jnp.float32(0.0))
        nstat_ref[0, 0] = nstat_ref[0, 0] + started

        @pl.when(k_idx == k_steps - 1)
        def _count_work():
            sl = pl.ds(b_idx * blk, blk)
            work = jnp.sum(((alive_ref[sl] > 0)
                            | (quota_ref[sl] > 0)).astype(jnp.float32))
            nstat_ref[0, 1] = nstat_ref[0, 1] + work

    return kernel


def _pack_col_tables(domain: OpticalDomain):
    """(mcolT [384, 128] bf16, mblkT [256, 128] bf16, nbx, nby).

    mcolT stacks field transposes M_f^T ([128lo, 128hi], with
    M_f[hi, lo] = field(col = hi*128 + lo)) along ROWS so the kernel runs
    one dot per sublane row for all fields; fields: bf16(scale), bf16
    residual of scale, height. mblkT likewise for the xy-block
    (majorant scale [rounded up host-side], max height).
    """
    nx, ny, nz = domain.grid.shape
    nxy = nx * ny

    def to_m(vals_f32, n_entries):
        pad = 128 * 128 - n_entries
        v = jnp.pad(vals_f32, (0, pad))
        return v.reshape(128, 128).T  # [lo, hi]

    scale = domain.col_scale.astype(jnp.float32)
    s_hi = scale.astype(jnp.bfloat16).astype(jnp.float32)
    s_lo = scale - s_hi
    height = domain.col_height.astype(jnp.float32)
    mcol = jnp.concatenate([to_m(s_hi, nxy), to_m(s_lo, nxy),
                            to_m(height, nxy)], axis=0)

    f = domain.macro_factor
    if f > 0:
        nbx, nby = -(-nx // f), -(-ny // f)
        mt = domain.macro_table  # [nbx*nby, 2] (pre-rounded majorant, hmax)
        mblk = jnp.concatenate([to_m(mt[:, 0], nbx * nby),
                                to_m(mt[:, 1], nbx * nby)], axis=0)
    else:
        nbx = nby = 0
        mblk = jnp.zeros((256, 128), jnp.float32)
    return (mcol.astype(jnp.bfloat16), mblk.astype(jnp.bfloat16), nbx, nby)


def _pack_col_emission(domain: OpticalDomain):
    """(m_ecol [768, 128] bf16, m_fcum [8, 128] f32).

    m_ecol stacks the 6 emission fields as M^T [lo, hi]: column-alias
    prob hi/lo, alias-target hi/lo (targets < 16384: bf16 residual is
    exact), height at the bin, height at the bin's ALIAS TARGET
    (precomputed host-side so ONE gather serves the redirect too).
    m_fcum row 0 is the cumulative Planck table padded with _BIG past nz
    (kept f32: the truncated-CDF inversion compares against it).
    """
    nx, ny, nz = domain.grid.shape
    nxy = nx * ny

    def to_m(vals_f32, n_entries):
        pad = 128 * 128 - n_entries
        v = jnp.pad(vals_f32, (0, pad))
        return v.reshape(128, 128).T  # [lo, hi]

    pc_ = domain.col_em_prob.astype(jnp.float32)
    ac_ = domain.col_em_alias.astype(jnp.float32)
    pc_h = pc_.astype(jnp.bfloat16).astype(jnp.float32)
    ac_h = ac_.astype(jnp.bfloat16).astype(jnp.float32)
    m_ecol = jnp.concatenate([
        to_m(pc_h, nxy), to_m(pc_ - pc_h, nxy),
        to_m(ac_h, nxy), to_m(ac_ - ac_h, nxy),
        to_m(domain.col_height.astype(jnp.float32), nxy),
        to_m(domain.col_em_halias.astype(jnp.float32), nxy),
    ], axis=0).astype(jnp.bfloat16)
    fcum = jnp.pad(domain.col_em_fcum.astype(jnp.float32),
                   (0, 128 - nz), constant_values=_BIG)
    m_fcum = jnp.zeros((8, 128), jnp.float32).at[0].set(fcum)
    return m_ecol, m_fcum


def _pack_col_ab(domain: OpticalDomain):
    """(mabx [2*nx rows (8-padded), 128] f32, maby likewise for ny).

    Per-column closed-form CT coefficients for the slab-scan radiance
    march: CT(z) = max(0, A - B*z) is the vertical cloud optical depth
    from z to the column top, with A = scale*z_cloudtop(phys) and
    B = scale. mabx interleaves per x-slab rows (row 2*ix = A over y
    lanes, row 2*ix+1 = B); maby is the transposed orientation for
    y-fast directions.
    """
    nx, ny, nz = domain.grid.shape
    ze = domain.grid.z_edges
    z0 = ze[0]
    dz = (ze[-1] - ze[0]) / nz
    scale2 = domain.col_scale.astype(jnp.float32).reshape(nx, ny)
    h2 = domain.col_height.astype(jnp.float32).reshape(nx, ny)
    a2 = scale2 * (z0 + h2 * dz)
    b2 = scale2

    def pack(a_f, b_f, n_f, n_s):
        m = jnp.stack([a_f, b_f], axis=1).reshape(2 * n_f, n_s)
        rows_pad = -(-2 * n_f // 8) * 8
        return jnp.pad(m, ((0, rows_pad - 2 * n_f), (0, 128 - n_s)))

    return (pack(a2, b2, nx, ny), pack(a2.T, b2.T, ny, nx))


def run_batch_pallas_col(domain: OpticalDomain,
                         surface: Surface,
                         source: illumination.Source,
                         key: jax.Array,
                         pcfg: PallasConfig,
                         photons_per_lane: int,
                         n_photons=None,
                         use_russian_roulette: bool = True,
                         russian_roulette_weight: float = 1.0,
                         need_vol: bool = False,
                         lw_mode: bool = False,
                         intensity_dirs=None):
    """One photon batch through the column megakernel.

    Returns (flux_up [nx,ny], flux_down [nx,ny], abs_col [nx,ny],
    abs_profile [nz], vol [nx,ny,nz] or None, n_started, n_bad,
    n_calls); with pcfg.n_dirs > 0 an [nx, ny, n_dirs] raw intensity
    array is appended (directions in the PERMUTED order -- the tallies
    entry un-permutes).
    """
    grid = domain.grid
    nx, ny, nz = grid.shape
    nxy = nx * ny
    rows = pcfg.rows
    n_lanes = pcfg.n_lanes
    if n_lanes * photons_per_lane >= 2 ** 31:
        raise ValueError("quota budget overflows int32; split batches")

    mcol, mblk, nbx, nby = _pack_col_tables(domain)
    has_gas = domain.col_qz is not None
    analytic_hg = bool(domain.col_analytic_hg if has_gas
                       else domain.all_hg)
    if analytic_hg:
        inv_packed = jnp.zeros((24, 128), jnp.bfloat16)
        inv_hp, inv_n_steps = 8, 0
    elif has_gas:
        from mcbrat3d_tpu.transport.pallas_kernel import _pack_inverse_row
        inv_packed, inv_hp, inv_n_steps = _obj_cache(
            domain, ("colinv", True),
            lambda: _pack_inverse_row(domain, domain.col_inv_row,
                                      hif=True))
    else:
        inv_packed, inv_hp, inv_n_steps = _pack_inverse_table(domain,
                                                              hif=True)
    if has_gas:
        ze_g = grid.z_edges
        dz_g = (ze_g[-1] - ze_g[0]) / nz
        qz_v = domain.col_qz.astype(jnp.float32)
        # row 1: cumulative gas optical depth from the BOTTOM of cell k
        # to TOA (the radiance march's closed-form gas term)
        qcb = jnp.cumsum(qz_v[::-1])[::-1] * dz_g
        m_qz = (jnp.zeros((8, 128), jnp.float32)
                .at[0, :nz].set(qz_v)
                .at[1, :nz].set(qcb))
    else:
        m_qz = jnp.zeros((8, 128), jnp.float32)
    lw = bool(lw_mode) and source.kind == illumination.EMISSION
    if source.kind == illumination.EMISSION:
        m_ecol, m_fcum = _obj_cache(
            domain, ("colem",), lambda: _pack_col_emission(domain))
        atms_frac = source.atms_fraction
    else:
        m_ecol = jnp.zeros((768, 128), jnp.bfloat16)
        m_fcum = jnp.zeros((8, 128), jnp.float32)
        atms_frac = 0.0
    # ---- radiance (slab-scan local estimation) tables ----
    n_dirs = pcfg.n_dirs
    hti = max(8, -(-(-(-nxy // 128)) // 8) * 8)
    if n_dirs > 0:
        mabx, maby = _obj_cache(domain, ("colab",),
                                lambda: _pack_col_ab(domain))
        use_hybrid = pcfg.intensity_phase == "hybrid"
        fwd_table = (domain.tables.forward if use_hybrid
                     else domain.tables.forward_orig)
        use_fwd = fwd_table.shape[1] > 1
        if use_fwd:
            fwd_packed, fwd_hf, fwd_n_s = _obj_cache(
                domain, ("fwdcol", use_hybrid),
                lambda: _pack_forward_table(domain, use_hybrid, hif=True))
        else:
            fwd_packed = jnp.zeros((256, 8), jnp.float32)
            fwd_hf, fwd_n_s = 8, 0
        dirs_a = intensity_dirs.astype(jnp.float32)
    else:
        mabx = maby = jnp.zeros((8, 128), jnp.float32)
        fwd_packed = jnp.zeros((256, 8), jnp.float32)
        fwd_hf, fwd_n_s = 8, 0
        use_fwd = False
        dirs_a = jnp.zeros((3, 1), jnp.float32)
    # ---- per-pixel Lambertian albedo ([256, 128] bf16 hi/lo M^T) ----
    has_px = (not surface.is_uniform_lambertian
              and surface_px_ok(surface, grid, lw, max_cols=MAX_COLS))
    if has_px:
        def _build_alb():
            p = jnp.asarray(surface.params[:, :, 0], jnp.float32)
            nxs, nys = p.shape
            col = jnp.repeat(jnp.repeat(p, nx // nxs, axis=0),
                             ny // nys, axis=1)
            flat = col.reshape(-1)
            f_hi = flat.astype(jnp.bfloat16).astype(jnp.float32)
            f_lo = flat - f_hi

            def to_m(v):
                return jnp.pad(v, (0, 128 * 128 - nxy)).reshape(
                    128, 128).T

            return jnp.concatenate(
                [to_m(f_hi), to_m(f_lo)], axis=0).astype(jnp.bfloat16)

        alb_packed = _obj_cache(surface, ("colalb", nx, ny), _build_alb)
    else:
        alb_packed = jnp.zeros((256, 128), jnp.bfloat16)
    kernel = _build_kernel_col((nx, ny, nz), pcfg, source.kind,
                               use_russian_roulette, domain.macro_factor,
                               nbx, nby, analytic_hg=analytic_hg,
                               inv_hp=inv_hp, inv_n_steps=inv_n_steps,
                               need_vol=need_vol, lw=lw, has_gas=has_gas,
                               n_dirs=n_dirs, le_groups=pcfg.dir_groups,
                               use_irr=pcfg.intensity_rr,
                               use_fwd=use_fwd, fwd_hf=fwd_hf,
                               fwd_n_s=fwd_n_s, hti=hti, has_px=has_px)

    beta_max = jnp.maximum(domain.max_extinction, _TINY)
    if source.kind in (illumination.DIRECTIONAL,
                       illumination.RANDOM_AZIMUTH):
        smu = source.solar_mu
        sphi = (source.solar_azimuth
                if source.kind == illumination.DIRECTIONAL else 0.0)
    else:
        smu, sphi = 0.0, 0.0
    ge = grid.x_edges, grid.y_edges, grid.z_edges
    if has_gas:
        # cloud scalars from detection (the record layout differs for
        # 2 components); qg = max gas extinction (the above-cloud and
        # in-region majorant addend)
        ssa_par = domain.col_cloud[0]
        g_par = domain.col_cloud[1]
        qg_par = domain.col_cloud[2]
    else:
        ssa_par = domain.cell_records[0, 3]   # uniform ssa
        g_par = domain.cell_records[0, 5]     # uniform HG g
        qg_par = jnp.float32(0.0)
    params = jnp.stack([
        beta_max, 1.0 / beta_max,
        surface.params.reshape(-1)[0],
        jnp.asarray(smu, jnp.float32), jnp.asarray(sphi, jnp.float32),
        jnp.float32(russian_roulette_weight),
        ge[0][0], ge[0][-1] - ge[0][0],
        ge[1][0], ge[1][-1] - ge[1][0],
        ge[2][0], ge[2][-1] - ge[2][0],
        ssa_par,
        g_par,
        jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.float32(smu) ** 2))
        * jnp.cos(jnp.float32(sphi)),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.float32(smu) ** 2))
        * jnp.sin(jnp.float32(sphi)),
        jnp.asarray(atms_frac, jnp.float32),
        jnp.asarray(qg_par, jnp.float32),    # 17: gas majorant addend
        jnp.float32(pcfg.zeta_min),          # 18: Iwabuchi zeta_min
        jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0),
    ]).reshape(1, 24)

    if n_photons is None:
        quota0 = jnp.full((rows, 128), photons_per_lane, jnp.int32)
    else:
        cap = n_lanes * photons_per_lane
        n_ph = jnp.minimum(jnp.asarray(n_photons, jnp.int32), cap)
        lane_i = (jnp.arange(rows, dtype=jnp.int32)[:, None] * 128
                  + jnp.arange(128, dtype=jnp.int32)[None, :])
        quota0 = (n_ph // n_lanes) + (lane_i < (n_ph % n_lanes)).astype(
            jnp.int32)

    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = (kd[0] * np.uint32(0x9E37_79B9) ^ kd[-1]).astype(jnp.int32)

    f32z = jnp.zeros((rows, 128), jnp.float32)
    state0 = dict(
        x=f32z, y=f32z, z=f32z, ux=f32z, uy=f32z,
        uz=jnp.ones((rows, 128), jnp.float32), w=f32z,
        quota=quota0, alive=jnp.zeros((rows, 128), jnp.int32),
        bls=jnp.full((rows, 128), jnp.float32(beta_max)),
        blh=jnp.full((rows, 128), jnp.float32(nz)),
    )
    acc0 = jnp.zeros((384, 128), jnp.float32)
    accz0 = jnp.zeros((8, 128), jnp.float32)
    # 3D tally accumulator (a 4 KB dummy keeps the signature static
    # when the tally is off)
    acc30 = jnp.zeros((nz * 128 if need_vol else 8, 128), jnp.float32)
    acci0 = jnp.zeros((max(8, n_dirs * hti), 128), jnp.float32)

    keys = ("x", "y", "z", "ux", "uy", "uz", "w", "quota", "alive",
            "bls", "blh")
    n_state = len(keys)
    grid_spec = pl.GridSpec(
        grid=(pcfg.steps_per_call, rows // pcfg.block_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]  # dirs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 14),
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 4)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
    )
    state_shapes = [
        jax.ShapeDtypeStruct((rows, 128),
                             jnp.int32 if k in ("quota", "alive")
                             else jnp.float32)
        for k in keys]
    out_shape = state_shapes + [
        jax.ShapeDtypeStruct((384, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct(acc30.shape, jnp.float32),
        jax.ShapeDtypeStruct(acci0.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 8), jnp.float32),
    ]
    aliases = {3 + i: i for i in range(n_state)}
    aliases[3 + n_state + 10] = n_state      # acc
    aliases[3 + n_state + 11] = n_state + 1  # accz
    aliases[3 + n_state + 12] = n_state + 2  # acc3
    aliases[3 + n_state + 13] = n_state + 3  # acci

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pcfg.interpret,
    )

    def cond(carry):
        state, acc, accz, acc3, acci, n_started, n_calls, work = carry
        return work & (n_calls * pcfg.steps_per_call < pcfg.max_steps)

    def body(carry):
        state, acc, accz, acc3, acci, n_started, n_calls, work = carry
        scal = jnp.stack([seed, n_calls * pcfg.steps_per_call]).astype(
            jnp.int32)
        outs = call(scal, params, dirs_a, *[state[k] for k in keys],
                    mcol, mblk, inv_packed, m_ecol, m_fcum, m_qz,
                    mabx, maby, fwd_packed, alb_packed,
                    acc, accz, acc3, acci)
        new_state = dict(zip(keys, outs[:n_state]))
        acc = outs[n_state]
        accz = outs[n_state + 1]
        acc3 = outs[n_state + 2]
        acci = outs[n_state + 3]
        stats = outs[n_state + 4]
        n_started = n_started + stats[0, 0].astype(jnp.int32)
        work = stats[0, 1] > 0
        q = new_state["quota"]
        total_q = jnp.sum(q)
        lane_i = (jnp.arange(rows, dtype=jnp.int32)[:, None] * 128
                  + jnp.arange(128, dtype=jnp.int32)[None, :])
        new_state["quota"] = (total_q // n_lanes) + (
            lane_i < (total_q % n_lanes)).astype(jnp.int32)
        return (new_state, acc, accz, acc3, acci, n_started, n_calls + 1,
                work)

    carry = (state0, acc0, accz0, acc30, acci0, jnp.int32(0),
             jnp.int32(0), jnp.bool_(True))
    (state_f, acc_f, accz_f, acc3_f, acci_f, n_started, n_calls,
     _) = jax.lax.while_loop(cond, body, carry)

    # sections: t = hi*128 + lo = col
    flux_up = acc_f[0:128].reshape(-1)[:nxy].reshape(nx, ny)
    flux_down = acc_f[128:256].reshape(-1)[:nxy].reshape(nx, ny)
    abs_col = acc_f[256:384].reshape(-1)[:nxy].reshape(nx, ny)
    # row 0: collision absorption; row 1: LW emission pre-credits
    abs_profile = accz_f[0, :nz] + accz_f[1, :nz]
    vol = None
    if need_vol:
        # acc3[iz*128 + hi, lo] -> [iz, col=hi*128+lo] -> [nx, ny, nz]
        vol = jnp.transpose(
            acc3_f.reshape(nz, 128 * 128)[:, :nxy]).reshape(nx, ny, nz)
    n_bad = jnp.sum(state_f["alive"], dtype=jnp.int32)
    base = (flux_up, flux_down, abs_col, abs_profile, vol,
            n_started, n_bad, n_calls)
    if n_dirs > 0:
        intensity = jnp.stack(
            [acci_f[d * hti:(d + 1) * hti]
             .reshape(-1)[:nxy].reshape(nx, ny) for d in range(n_dirs)],
            axis=-1)
        base = base + (intensity,)
    return base


def run_batch_pallas_col_tallies(domain, surface, source, key, config,
                                 n_photons=None, interpret: bool = False,
                                 intensity_config=None,
                                 intensity_dirs=None, march_plan=None):
    """run_batch-compatible entry returning a transport.integrator.Tallies
    (absorption_profile carries the z marginal; volume_absorption is
    tallied in-kernel when config.need_volume_absorption, else None;
    intensity via the in-kernel slab-scan local estimation when
    intensity_config is given).

    ``march_plan`` is plan_col_march's output, computed pre-jit by
    run_batch; direct callers with concrete dirs may omit it.
    """
    import dataclasses as _dc

    from mcbrat3d_tpu.transport.integrator import Tallies
    from mcbrat3d_tpu.transport.pallas_kernel import config_for

    pcfg, ppl = config_for(config.n_lanes, config.photons_per_lane,
                           config.max_steps, interpret)
    # the bilinear gather materializes [blk, 128, 128] f32 intermediates
    # per field; cap the block size to bound transient VMEM
    if pcfg.block_rows > 32:
        pcfg = _dc.replace(pcfg, block_rows=32)
    perm = ()
    if intensity_config is not None:
        icfg = intensity_config
        # radiance launch geometry: LE cost is per BLOCK-STEP, so lane
        # occupancy beats wave width (see pallas_kernel's radiance
        # re-blocking; measured round 4)
        total_ph = config.n_lanes * config.photons_per_lane
        rows_i = min(pcfg.rows, 32)
        ppl = -(-total_ph // (rows_i * 128))
        pcfg = _dc.replace(pcfg, rows=rows_i,
                           block_rows=min(rows_i, 32))
        if march_plan is None:
            march_plan = plan_col_march(domain.grid, domain, icfg,
                                        intensity_dirs)
        if march_plan is None:
            raise ValueError("column-kernel radiance needs concrete "
                             "direction cosines (plan_col_march)")
        a_list, k_list, groups, perm = march_plan
        phase = ("hybrid" if icfg.use_hybrid_phase
                 else ("analytic" if domain.all_hg else "orig"))
        pcfg = _dc.replace(
            pcfg, n_dirs=icfg.n_dirs, dir_groups=groups, dir_perm=perm,
            intensity_rr=icfg.use_russian_roulette,
            zeta_min=icfg.zeta_min, intensity_phase=phase)
        # permute with jnp indexing: dirs may be traced (the plan itself
        # always comes from concrete cosines pre-jit)
        intensity_dirs = jnp.take(jnp.asarray(intensity_dirs, jnp.float32),
                                  jnp.asarray(perm), axis=1)
    if n_photons is None:
        n_photons = config.photons_per_batch
    out = run_batch_pallas_col(
        domain, surface, source, key, pcfg, ppl, n_photons=n_photons,
        use_russian_roulette=config.use_russian_roulette,
        russian_roulette_weight=config.russian_roulette_weight,
        need_vol=bool(config.need_volume_absorption),
        lw_mode=bool(config.lw_mode),
        intensity_dirs=intensity_dirs)
    fu, fd, ac, az, vol, n_started, n_bad, n_calls = out[:8]
    intensity = None
    if pcfg.n_dirs > 0:
        img = out[8]
        # un-permute back to the caller's direction order (dir_perm[j]
        # is the ORIGINAL index marched as sorted index j)
        order = [0] * pcfg.n_dirs
        for j, orig in enumerate(perm):
            order[orig] = j
        intensity = img[:, :, jnp.asarray(order)]
    return Tallies(
        flux_up=fu, flux_down=fd,
        flux_absorbed=ac,
        volume_absorption=vol,
        absorption_profile=az,
        intensity=intensity,
        n_photons=n_started, n_bad=n_bad,
        n_steps=n_calls * pcfg.steps_per_call,
    )
