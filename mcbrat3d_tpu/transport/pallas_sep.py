"""Separable-template Pallas megakernel: flagship-scale LW/SW domains.

The column-template kernel (transport/pallas_col.py) covers Landsat-class
scenes up to 16384 columns; the reference's broadband-LW flagship is
325 x 325 x 150 = 15.8M cells over 105,625 columns (reference:
run/I3RC_bench_LW.deck:45, run at 2,000 ranks in <= 1 h), past every
per-cell AND the 128x128-column envelope. Its structure, though, is the
standard stratocumulus-over-gas decomposition

    beta(x, y, z) = a[col] * p[z] + q[z]

(a rank-1 cloud layer times a vertical profile, plus a horizontally
uniform absorber -- detected exactly at build time, domain.sep_template).
This kernel exploits it TPU-first:

  * ONE bf16 hi/lo per-column amplitude gather per event, extended past
    16384 columns by slicing the column space into <= 8 blocks of 128x128
    (col = sl * 16384 + hi * 128 + lo) and running the factorized one-hot
    dot once per slice with the slice membership folded into the hi
    one-hot (masking beats a single wide-iota compare: the 128-row
    one-hot is built once and reused by every slice);
  * per-z profile fields (p, q as bf16 hi/lo splits) in a [16, 128] VMEM
    table read by a z one-hot dot -- the 15.8M-cell field costs 8 rows;
  * a 3-region majorant: below / inside / above the cloud slab
    [sep_zb, sep_zt). Inside, the ceiling is a carried per-xy-block value
    (max block amplitude * max p + max in-slab q, bf16-bumped up); the
    jump clips at xy block faces and the slab planes. Outside, the
    ceiling is the region's global gas maximum and only the facing slab
    plane clips (the gas is horizontally uniform: no xy clipping needed);
  * thermal (BBEmission) refills IN-KERNEL from the separable emission
    decomposition: kabs * B(T(z)) = a[col] * P1[z] + Q1[z] (temps are
    z-uniform, domain.sep_tz_uniform), so the 15.8M-voxel Walker alias
    table of the record kernel becomes a 105,625-entry COLUMN alias (one
    factorized gather) plus two 256-entry z aliases -- O(1) per refill
    with ~1 MB of VMEM instead of an impossible 250 MB;
  * gas is a pure absorber (ssa == 0, enforced at detection), so
    scattering is always the cloud's single phase entry: analytic HG or
    one tabulated inverse-CDF row;
  * sectioned per-slice column tallies (flux up / flux down / net column
    absorption with bf16 hi/lo value splits) share the event one-hots;
    LW emission pre-credits (-1 at the birth column/level) run as a
    second masked contraction; a z-profile tally serves the reference's
    absorption/heating profile output.

Reference hot loop being replaced:
Integrators/monteCarloRadiativeTransfer.f95:393-841 (computeRT) with the
BBEmission source of src/monteCarloIllumination.f95:431-522.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.pallas_kernel import (
    PallasConfig,
    _hif_gather2,
    _make_uniform,
    _obj_cache,
)

_TINY = np.float32(1e-30)
_TOP_EPS = np.float32(1e-6)
_BIG = np.float32(3e38)

MAX_COLS_SEP = 128 * 128 * 8  # bf16 hi/lo alias splits stay integer-exact
MAX_BLOCKS = 128 * 128


def sep_ineligibility_reasons(domain: OpticalDomain, surface: Surface,
                              source: illumination.Source,
                              lw_mode: bool, compute_intensity: bool,
                              record_scattering_orders: int,
                              use_ray_tracing: bool,
                              need_volume_absorption: bool) -> list:
    """Names of every failing separable-megakernel predicate."""
    nx, ny, nz = domain.grid.shape
    f = domain.macro_factor if domain.macro_factor > 0 else max(nx, ny)
    nbx, nby = -(-nx // f), -(-ny // f)
    em_ok = (source.kind != illumination.EMISSION
             or ((source.em_prob is not None or source.em_sep)
                 and domain.sep_em_prob is not None))
    checks = (
        ("domain is not separable (beta != a[col]*p[z] + q[z]; "
         "see OpticalDomain.sep_template)", domain.sep_template),
        ("non-uniform or non-Lambertian surface",
         surface.is_uniform_lambertian),
        (f"source kind {source.kind!r} not in-kernel",
         source.kind in (illumination.DIRECTIONAL,
                         illumination.RANDOM_AZIMUTH,
                         illumination.FLUX, illumination.EMISSION)),
        ("emission source needs concrete arrays, z-uniform temps and "
         "domain lambda_um > 0 (for the separable Planck weighting)",
         em_ok),
        ("lw_mode without an emission source",
         (not lw_mode) or source.kind == illumination.EMISSION),
        ("compute_intensity (radiance) not in the separable kernel",
         not compute_intensity),
        ("record_scattering_orders > 0", record_scattering_orders == 0),
        ("use_ray_tracing=True (megakernel is max-cross-section only)",
         not use_ray_tracing),
        ("need_volume_absorption (3D tally) not in the separable kernel",
         not need_volume_absorption),
        (f"nx*ny={nx * ny} > {MAX_COLS_SEP}", nx * ny <= MAX_COLS_SEP),
        (f"xy blocks {nbx * nby} > {MAX_BLOCKS}", nbx * nby <= MAX_BLOCKS),
        (f"nz={nz} > 256", nz <= 256),
    )
    return [name for name, ok in checks if not ok]


def pallas_sep_eligible(domain, surface, source, lw_mode,
                        compute_intensity, record_scattering_orders,
                        use_ray_tracing, need_volume_absorption) -> bool:
    return not sep_ineligibility_reasons(
        domain, surface, source, lw_mode, compute_intensity,
        record_scattering_orders, use_ray_tracing, need_volume_absorption)


def _to_m(vals, n_entries):
    """[16384] flat slice -> M^T [128lo, 128hi]."""
    pad = 128 * 128 - n_entries
    v = jnp.pad(vals, (0, pad))
    return v.reshape(128, 128).T


def _pack_sep_tables(domain: OpticalDomain):
    """(m_amp [n_sl*256,128] bf16, m_ampT [256,n_sl*128] bf16,
    m_blk [128,128] bf16, m_z [16,128] bf16, n_sl, nbx, nby).

    m_amp stacks per-slice (amp_hi^T, amp_lo^T); m_ampT is the hi-first
    layout of the SAME values (rows [0:128) amp_hi^T, [128:256) amp_lo^T,
    lanes = the full hi index h = col >> 7 across slices) -- one
    [256, n_sl*128] @ [n_sl*128, 128] dot per block row replaces the
    per-slice gather's n_sl dots at equal MACs but ~n_sl x less
    intermediate traffic (see pallas_kernel._hif_gather2); m_blk holds
    the host-bumped per-block in-slab ceilings (<= 16384 blocks, one
    slice); m_z rows [f*2 + zslice] hold the z profiles p_hi, p_lo,
    q_hi, q_lo over z = zslice*128 + lo (nz padded to 256).
    """
    nx, ny, nz = domain.grid.shape
    nxy = nx * ny
    n_sl = -(-(-(-nxy // 128)) // 128)

    amp = domain.sep_amp.astype(jnp.float32)
    a_hi = amp.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = amp - a_hi
    blocks = []
    for s in range(n_sl):
        seg = slice(s * 16384, min((s + 1) * 16384, nxy))
        n_e = seg.stop - seg.start
        blocks.append(_to_m(a_hi[seg], n_e))
        blocks.append(_to_m(a_lo[seg], n_e))
    m_amp = jnp.concatenate(blocks, axis=0).astype(jnp.bfloat16)
    m_ampT = jnp.concatenate(
        [jnp.concatenate(blocks[0::2], axis=1),      # hi rows
         jnp.concatenate(blocks[1::2], axis=1)],     # lo rows
        axis=0).astype(jnp.bfloat16)

    f = domain.macro_factor if domain.macro_factor > 0 else max(nx, ny)
    nbx, nby = -(-nx // f), -(-ny // f)
    m_blk = _to_m(domain.sep_block.astype(jnp.float32),
                  nbx * nby).astype(jnp.bfloat16)

    def zrows(v):
        vp = jnp.pad(v.astype(jnp.float32), (0, 256 - nz))
        hi = vp.astype(jnp.bfloat16).astype(jnp.float32)
        return hi.reshape(2, 128), (vp - hi).reshape(2, 128)

    p_h, p_l = zrows(domain.sep_pz)
    q_h, q_l = zrows(domain.sep_qz)
    m_z = jnp.concatenate(
        [p_h, p_l, q_h, q_l, jnp.zeros((8, 128), jnp.float32)],
        axis=0).astype(jnp.bfloat16)
    return m_amp, m_ampT, m_blk, m_z, n_sl, nbx, nby


def _pack_sep_emission(domain: OpticalDomain, n_sl: int):
    """Pack the domain's separable BBEmission aliases for the kernel.

    The alias CONSTRUCTION is host-side at build_domain time
    (domain.sep_em_* fields; the Walker construction is sequential,
    native/alias.cpp) -- this function is pure jnp packing so it traces
    under jit. Layouts: m_ea rows per slice s hold (prob_hi, prob_lo,
    alias_hi, alias_lo) of the column alias in M^T [lo, hi] form; m_eaz
    rows 0..5 are the cloud-branch z alias (prob hi/lo x2, alias x2),
    rows 6..11 the gas branch. Reference sampling being replaced:
    src/monteCarloIllumination.f95:495-498 (3-level CDF scan).

    Returns (m_ea [n_sl*512,128] bf16, m_eaz [16,128] bf16,
    p_cloud_branch f32 scalar).
    """
    nx, ny, nz = domain.grid.shape
    nxy = nx * ny
    rows = []
    for s in range(n_sl):
        seg = slice(s * 16384, min((s + 1) * 16384, nxy))
        n_e = seg.stop - seg.start
        pc = domain.sep_em_prob[seg].astype(jnp.float32)
        ac = domain.sep_em_alias[seg].astype(jnp.float32)  # col < 2^17
        pc_h = pc.astype(jnp.bfloat16).astype(jnp.float32)
        ac_h = ac.astype(jnp.bfloat16).astype(jnp.float32)
        rows += [_to_m(pc_h, n_e), _to_m(pc - pc_h, n_e),
                 _to_m(ac_h, n_e), _to_m(ac - ac_h, n_e)]
    m_ea = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)

    def z_alias_rows(pr, al):
        prp = jnp.pad(pr.astype(jnp.float32), (0, 256 - nz))
        alp = jnp.pad(al.astype(jnp.float32), (0, 256 - nz))
        pr_h = prp.astype(jnp.bfloat16).astype(jnp.float32)
        # alias targets < 256 are bf16-exact
        return [pr_h.reshape(2, 128), (prp - pr_h).reshape(2, 128),
                alp.reshape(2, 128)]

    zpa = domain.sep_em_zpa
    m_eaz = jnp.concatenate(
        z_alias_rows(zpa[0], zpa[1]) + z_alias_rows(zpa[2], zpa[3])
        + [jnp.zeros((4, 128), jnp.float32)], axis=0).astype(jnp.bfloat16)
    return m_ea, m_eaz, domain.sep_em_pb[0]


def _pack_sep_emission_z(domain: OpticalDomain):
    """(m_eaz [16,128] bf16, p_cloud_branch): the z-alias + branch-split
    part of _pack_sep_emission, for the group-rejection column sampler
    that does not need the per-column alias upload."""
    nz = domain.grid.shape[2]

    def z_alias_rows(pr, al):
        prp = jnp.pad(pr.astype(jnp.float32), (0, 256 - nz))
        alp = jnp.pad(al.astype(jnp.float32), (0, 256 - nz))
        pr_h = prp.astype(jnp.bfloat16).astype(jnp.float32)
        return [pr_h.reshape(2, 128), (prp - pr_h).reshape(2, 128),
                alp.reshape(2, 128)]

    zpa = domain.sep_em_zpa
    m_eaz = jnp.concatenate(
        z_alias_rows(zpa[0], zpa[1]) + z_alias_rows(zpa[2], zpa[3])
        + [jnp.zeros((4, 128), jnp.float32)], axis=0).astype(jnp.bfloat16)
    return m_eaz, domain.sep_em_pb[0]


def _pack_sep_emission_groups(domain: OpticalDomain):
    """[24,128] f32 group-proposal tables for the in-kernel rejection
    column sampler.

    The cloud-branch emission column density is exactly proportional to
    sep_amp (separability: per-column cloud emission = amp * a column-
    independent z sum), so instead of a per-column Walker alias gathered
    over every 16384-column slice per step, the kernel samples a
    128-column GROUP g ~ alias(weights = max amp in group), a uniform
    lo in [0,128), and accepts with amp[col]/gmax[g] -- restart on
    reject. The accepted marginal is exactly proportional to amp (pad
    columns have amp 0 and auto-reject); the only cost per attempt is
    one [8,128]-tile fetch per field plus the collision amp gather the
    step already pays. Rows 0-7: group Walker prob; 8-15: alias target
    (f32-exact, < 1024); 16-23: group max amp.
    """
    from mcbrat3d_tpu.sources.illumination import _walker_alias

    nx, ny, _ = domain.grid.shape
    nxy = nx * ny
    n_groups = -(-nxy // 128)
    pad = n_groups * 128 - nxy
    # Vose is host-side and sequential: use the host amp copy stashed at
    # build time (under a jit trace sep_amp is a tracer; a domain built
    # without the stash falls back to the alias path -- returns None)
    amp_np = getattr(domain, "_sep_amp_np", None)
    if amp_np is None:
        if isinstance(domain.sep_amp, jax.core.Tracer):
            return None
        amp_np = np.asarray(domain.sep_amp, np.float64)
    # match the kernel's gathered f32 amp exactly (acceptance compares
    # u * gmax < amp_f32; gmax must be the max of the F32 values)
    amp_f32 = np.asarray(amp_np, np.float32).astype(np.float64)
    gmax = np.pad(amp_f32, (0, pad)).reshape(n_groups, 128).max(axis=1)
    if gmax.sum() > 0:
        prob, alias = _walker_alias(gmax / gmax.sum())
    else:  # no cloud emission anywhere: tables never drawn (p_branch=0)
        prob = np.ones(n_groups)
        alias = np.arange(n_groups, dtype=np.float64)
    out = np.zeros((24, 128), np.float32)
    out[0:8].reshape(-1)[:n_groups] = prob
    out[8:16].reshape(-1)[:n_groups] = alias
    out[16:24].reshape(-1)[:n_groups] = gmax
    return jnp.asarray(out)


def _build_kernel_sep(shape, pcfg: PallasConfig, source_kind: str,
                      use_rr: bool, n_sl: int, macro_f: int,
                      nbx: int, nby: int, zb: int, zt: int, lw: bool,
                      analytic_hg: bool = True, inv_hp: int = 8,
                      inv_n_steps: int = 0):
    """Close over static shapes; returns the separable-mode kernel."""
    nx, ny, nz = shape
    rows, blk, k_steps = pcfg.rows, pcfg.block_rows, pcfg.steps_per_call
    nxy = nx * ny
    emission = source_kind == illumination.EMISSION
    n_groups = -(-nxy // 128)       # 128-column groups (rejection refill)
    n_hi_g = -(-n_groups // 128)

    part_set = frozenset(pcfg.debug_parts.split(","))
    hw_rng = (not pcfg.interpret) and "swrng" not in part_set
    # "oldem": force the per-column sliced alias gather for the emission
    # refill (A/B control for the group-rejection sampler)
    oldem = "oldem" in part_set
    # hi-first amplitude gather (one [256, n_sl*128] dot per block row
    # instead of n_sl sliced dots; bitwise-equal values): the DEFAULT on
    # multi-slice domains -- measured +36% on the 325x325x150 flagship
    # (11.0 -> 14.9 M photons/s marginal, session 9c). "oldamp" forces
    # the sliced form (A/B control); "hifamp" forces hi-first at n_sl=1
    # (where the two coincide in cost).
    # "dblamp"/"dbltally": run a DUPLICATE (index-perturbed) copy of the
    # amp gather / column tally whose result feeds only a scalar stat
    # counter -- the marginal wall-clock of the duplicate is an honest
    # per-part cost measurement with IDENTICAL physics and control flow
    # (part-DISABLING changes photon lifetimes and what XLA fuses; see
    # EXPERIMENTS_1e8.md "Lesson"). NB round-4 status: the duplicate
    # parts compile in interpret mode but hard-crash the TPU AOT
    # compiler (array.h CHECK) -- hardware decomposition pending.
    hifamp = ("hifamp" in part_set
              or (n_sl >= 2 and "oldamp" not in part_set))
    dblamp = "dblamp" in part_set
    dbltally = "dbltally" in part_set

    def kernel(scal_ref, par_ref,
               x_in, y_in, z_in, ux_in, uy_in, uz_in, w_in,
               quota_in, alive_in, bls_in,
               ma_ref, maT_ref, mb_ref, mz_ref, ea_ref, eaz_ref, eg_ref,
               inv_ref,
               acc_in, accz_in,
               x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref, w_ref,
               quota_ref, alive_ref, bls_ref,
               acc_ref, accz_ref, nstat_ref):
        k_idx = pl.program_id(0)
        b_idx = pl.program_id(1)

        @pl.when((k_idx == 0) & (b_idx == 0))
        def _init():
            for src, dst in ((x_in, x_ref), (y_in, y_ref), (z_in, z_ref),
                             (ux_in, ux_ref), (uy_in, uy_ref),
                             (uz_in, uz_ref), (w_in, w_ref),
                             (quota_in, quota_ref), (alive_in, alive_ref),
                             (bls_in, bls_ref),
                             (acc_in, acc_ref), (accz_in, accz_ref)):
                dst[:] = src[:]
            for _j in range(8):
                nstat_ref[0, _j] = 0.0

        seed = scal_ref[0]
        step0 = scal_ref[1]
        gmax = par_ref[0, 0]         # global ceiling (escape fallback)
        albedo = par_ref[0, 1]
        smu = par_ref[0, 2]
        rr_w = par_ref[0, 4]
        x0 = par_ref[0, 5]
        lx = par_ref[0, 6]
        y0 = par_ref[0, 7]
        ly = par_ref[0, 8]
        z0 = par_ref[0, 9]
        lz = par_ref[0, 10]
        ssa_c = par_ref[0, 11]
        g_u = par_ref[0, 12]
        q_below = par_ref[0, 13]
        q_above = par_ref[0, 14]
        ceil_in_max = par_ref[0, 15]
        atms_frac = par_ref[0, 17]
        p_branch = par_ref[0, 18]
        inv_dx = nx / lx
        inv_dy = ny / ly
        inv_dz = nz / lz
        dz = lz / nz
        z_max = z0 + lz
        z_eps = lz * _TOP_EPS
        z_slab_b = z0 + zb * dz      # slab planes (static level indices)
        z_slab_t = z0 + zt * dz

        lane0 = (jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 0)
                 * np.uint32(128)
                 + jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 1))
        seed_u = seed.astype(jnp.uint32)

        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (blk, 128, 128), 1)
        iota_hi3 = jax.lax.broadcasted_iota(jnp.int32, (128, blk, 128), 0)

        def sliced_gather(m_ref, ohh_bf, sl_c, n_fields):
            """Per-slice masked bilinear gather.

            m_ref rows [(s*n_fields + f)*128 : ...] hold field f of column
            slice s (M^T [lo, hi] layout). The slice id is folded into the
            hi one-hot by masking, so the 128-row one-hot is built once.
            Returns [blk, n_fields*128, p] f32, still needing the lo-mask
            reduce by the caller.
            """
            g3 = None
            for s in range(n_sl):
                mask_s = (sl_c == s).astype(jnp.bfloat16)
                part = [jnp.dot(m_ref[s * n_fields * 128:
                                      (s + 1) * n_fields * 128],
                                ohh_bf[:, b_i, :] * mask_s[b_i][None, :],
                                preferred_element_type=jnp.float32)
                        for b_i in range(blk)]
                p3 = jnp.stack(part, axis=0)  # [blk, nf*128, p]
                g3 = p3 if g3 is None else g3 + p3
            return g3

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
            # lane states: 0 dead, 1 alive, 2 committed (group-rejection
            # refill: a cloud-branch emission draw that was proposed but
            # not yet accepted -- it owns a quota unit and MUST retry the
            # cloud branch, or the per-branch acceptance rates would
            # reweight the atm/surface and cloud/gas splits)
            alive3 = alive_ref[sl]
            alive = alive3 == 1
            committed = alive3 == 2
            quota = quota_ref[sl]
            bls = bls_ref[sl]  # carried in-slab block ceiling

            # ---- refill dead lanes from the source ----
            dead_new = (alive3 == 0) & (quota > 0)
            need = dead_new | committed
            u0 = uniform(ctr, 0)
            u1 = uniform(ctr, 1)
            atm_emit = None
            col_b = iz_b = None
            pending = accept_gmax = cloud_br = None
            if emission:
                # separable BBEmission refill (see _pack_sep_emission)
                u_split = uniform(ctr, 10)
                u_bin = uniform(ctr, 11)
                u_acc = uniform(ctr, 12)
                u_mu = uniform(ctr, 13)
                u_zo = uniform(ctr, 14)
                u_br = uniform(ctr, 15)
                u_zbin = uniform(ctr, 16)
                u_zacc = uniform(ctr, 17)
                from_atm = u_split < atms_frac
                cloud_br = u_br < p_branch
                if not oldem:
                    # committed lanes retry the SAME branch
                    from_atm = from_atm | committed
                    cloud_br = cloud_br | committed

                if oldem:
                    # column: cloud branch via the sliced alias gather
                    jbin = jnp.minimum((u_bin * np.float32(nxy)).astype(
                        jnp.int32), np.int32(nxy - 1))
                    lo_e = jnp.bitwise_and(jbin, 127)
                    hi7_e = jnp.bitwise_and(jnp.right_shift(jbin, 7), 127)
                    sl_e = jnp.right_shift(jbin, 14)
                    ohh_e = (iota_hi3 == hi7_e[None, :, :]).astype(
                        jnp.bfloat16)
                    g3e = sliced_gather(ea_ref, ohh_e, sl_e, 4)
                    ohs_e = (lo_e[:, None, :] == iota_sub).astype(
                        jnp.float32)
                    p_j = jnp.sum((g3e[:, 0:128] + g3e[:, 128:256])
                                  * ohs_e, axis=1)
                    a_j = jnp.sum((g3e[:, 256:384] + g3e[:, 384:512])
                                  * ohs_e, axis=1)
                    col_cloud = jnp.where(u_acc < p_j, jbin,
                                          (a_j + 0.5).astype(jnp.int32))
                else:
                    # column: group-rejection sampler (docstring at
                    # _pack_sep_emission_groups). Propose a 128-column
                    # group by Walker alias over group-max weights, a
                    # uniform column within it, and accept against the
                    # exact amp -- fetched by the SAME sliced collision
                    # gather this step already pays (the lane is dead,
                    # its gather slot is free). Rejected lanes simply
                    # retry next step.
                    u_lo = uniform(ctr, 18)
                    jg = jnp.minimum(
                        (u_bin * np.float32(n_groups)).astype(jnp.int32),
                        np.int32(n_groups - 1))
                    jlo = jnp.bitwise_and(jg, 127)
                    jhi = jnp.right_shift(jg, 7)

                    def eg_fetch(r0, hi_i, lo_i):
                        v = jnp.zeros((blk, 128), jnp.float32)
                        for r in range(n_hi_g):
                            row = jnp.broadcast_to(
                                eg_ref[r0 + r: r0 + r + 1, :], (blk, 128))
                            got = jnp.take_along_axis(row, lo_i, axis=1)
                            v = jnp.where(hi_i == r, got, v)
                        return v

                    p_j = eg_fetch(0, jhi, jlo)
                    a_j = eg_fetch(8, jhi, jlo)
                    g_i = jnp.where(u_acc < p_j, jg,
                                    (a_j + 0.5).astype(jnp.int32))
                    accept_gmax = eg_fetch(16, jnp.right_shift(g_i, 7),
                                           jnp.bitwise_and(g_i, 127))
                    lo_p = jnp.minimum(
                        (u_lo * np.float32(128.0)).astype(jnp.int32),
                        np.int32(127))
                    col_cloud = g_i * np.int32(128) + lo_p
                # gas branch: uniform column, re-using the (otherwise
                # unused there) alias-bin draw -- NOT u0, which also sets
                # the sub-cell x offset and would correlate with it
                col_gas = jnp.minimum((u_bin * np.float32(nxy)).astype(
                    jnp.int32), np.int32(nxy - 1))
                col_b = jnp.where(cloud_br, col_cloud, col_gas)

                # z: branch alias over [16,128] rows
                # (rows 0..5 cloud: prob_hi x2, prob_lo x2, alias x2;
                #  rows 6..11 gas)
                zbin = jnp.minimum((u_zbin * np.float32(nz)).astype(
                    jnp.int32), np.int32(nz - 1))
                zlo = jnp.bitwise_and(zbin, 127)
                zhi = jnp.right_shift(zbin, 7)  # 0/1
                ohz_e = (zlo[:, None, :] == iota_sub).astype(jnp.bfloat16)
                ze_rows = [jnp.dot(eaz_ref[:], ohz_e[b_i],
                                   preferred_element_type=jnp.float32)
                           for b_i in range(blk)]
                ze = jnp.stack(ze_rows, axis=0)  # [blk, 16, p]
                zh = zhi.astype(jnp.float32)

                def zsel(r0):
                    return (ze[:, r0] * (1.0 - zh) + ze[:, r0 + 1] * zh)

                pz_c = zsel(0) + zsel(2)
                az_c = zsel(4)
                pz_g = zsel(6) + zsel(8)
                az_g = zsel(10)
                z_c = jnp.where(u_zacc < pz_c, zbin,
                                (az_c + 0.5).astype(jnp.int32))
                z_g = jnp.where(u_zacc < pz_g, zbin,
                                (az_g + 0.5).astype(jnp.int32))
                iz_b = jnp.where(cloud_br, z_c, z_g)

                colf = col_b.astype(jnp.float32)
                ixf = jnp.floor((colf + 0.5) * np.float32(1.0 / ny))
                iyf = colf - ixf * ny
                xa = x0 + (ixf + u0) * (lx / nx)
                ya = y0 + (iyf + u1) * (ly / ny)
                za = jnp.clip(z0 + (iz_b.astype(jnp.float32) + u_zo) * dz,
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
                s_phi = 2.0 * np.pi * uniform(ctr, 9)
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - s_mu * s_mu))
                sux = s_sin * jnp.cos(s_phi)
                suy = s_sin * jnp.sin(s_phi)
                if oldem:
                    atm_emit = need & from_atm
                else:
                    # Atmospheric refills are PENDING for one step: the
                    # cloud-branch acceptance needs this step's amp
                    # gather, and the LW birth pre-credit reuses the
                    # lane's (otherwise idle) tally slot at col_b/iz_b.
                    # Surface refills activate immediately as before.
                    pending = need & from_atm
            else:
                x = jnp.where(need, x0 + u0 * lx, x)
                y = jnp.where(need, y0 + u1 * ly, y)
                z = jnp.where(need, z_max - z_eps, z)
                if source_kind == illumination.DIRECTIONAL:
                    s_mu = -smu
                    sux = jnp.broadcast_to(par_ref[0, 19], (blk, 128))
                    suy = jnp.broadcast_to(par_ref[0, 20], (blk, 128))
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
            go_now = need if pending is None else (need & ~pending)
            alive = alive | go_now
            # a pending lane CLAIMS its quota unit at the first proposal
            # (committed retries claimed theirs earlier); `started` counts
            # only actual activations (go_now here, accept below)
            claim = (go_now if pending is None
                     else go_now | (pending & dead_new))
            quota = quota - claim.astype(jnp.int32)
            started = started + jnp.sum(go_now.astype(jnp.float32))
            # fresh photons carry the (always valid) global in-slab max
            bls = jnp.where(need, ceil_in_max, bls)

            # ---- Woodcock jump with the 3-region ceiling ----
            u_tau = uniform(ctr, 3)
            tau = -jnp.log1p(-u_tau)
            in_slab = (z >= z_slab_b) & (z < z_slab_t)
            below = z < z_slab_b
            ceiling = jnp.where(in_slab, bls,
                                jnp.where(below, q_below, q_above))
            d_samp = jnp.where(ceiling > 0,
                               tau / jnp.where(ceiling == 0, 1.0, ceiling),
                               _BIG)
            # clip planes: facing slab plane always; xy block faces only
            # inside the slab (the gas regions are horizontally uniform)
            bx_w = lx / nx * macro_f
            by_w = ly / ny * macro_f
            clip_nudge = 1e-5 * jnp.minimum(
                jnp.minimum(bx_w, by_w), dz)
            safe_ux = jnp.where(ux == 0, 1.0, ux)
            safe_uy = jnp.where(uy == 0, 1.0, uy)
            safe_uzc = jnp.where(uz == 0, 1.0, uz)
            # face positions CLAMPED to the domain edge: when nx/ny is
            # not divisible by macro_f (the 325x325 flagship at f=8),
            # the last partial block's outer face is VIRTUAL (past the
            # periodic seam) -- an unclamped jump would cross the wrap
            # into block 0 whose beta can exceed the carried bls,
            # violating the majorant (systematic under-attenuation
            # along the seam). Clipping at the edge lands the photon on
            # the seam; the next step re-gathers the wrapped block.
            fx = jnp.clip((jnp.floor((x - x0) / bx_w)
                           + (ux >= 0)) * bx_w, 0.0, lx)
            fy = jnp.clip((jnp.floor((y - y0) / by_w)
                           + (uy >= 0)) * by_w, 0.0, ly)
            tx = fx + x0 - x
            ty = fy + y0 - y
            tx = jnp.where(in_slab & (jnp.abs(ux) > 1e-12),
                           tx / safe_ux, _BIG)
            ty = jnp.where(in_slab & (jnp.abs(uy) > 1e-12),
                           ty / safe_uy, _BIG)
            # z planes: inside -> both; below -> z_slab_b going up;
            # above -> z_slab_t going down
            z_plane = jnp.where(
                in_slab, jnp.where(uz >= 0, z_slab_t, z_slab_b),
                jnp.where(below, z_slab_b, z_slab_t))
            # select the FLOAT operand and compare once: a nested where
            # over i1 vectors is an i8->i1 trunci Mosaic cannot lower on
            # real TPU ("Unsupported target bitwidth for truncation";
            # interpret mode accepts it, so only hardware catches this)
            plane_ok = jnp.where(
                in_slab, jnp.abs(uz),
                jnp.where(below, uz, -uz)) > 1e-12
            tz_p = jnp.where(plane_ok, (z_plane - z) / safe_uzc, _BIG)
            t_raw = jnp.minimum(jnp.minimum(tx, ty), tz_p)
            # a photon exactly ON an outward face takes one global-ceiling
            # step (its carried block value may belong to the block it is
            # leaving)
            escape = t_raw <= 0.0
            bls = jnp.where(escape, ceil_in_max, bls)
            ceiling = jnp.where(escape, gmax, ceiling)
            d_samp = jnp.where(escape, tau / gmax, d_samp)
            t_clip = jnp.where(escape, _BIG, t_raw + clip_nudge)
            clipped = t_clip < d_samp
            d = jnp.minimum(d_samp, t_clip)

            zn = z + uz * d
            exit_top = alive & (zn >= z_max)
            exit_bot = alive & ~exit_top & (zn <= z0)
            moved = alive & ~exit_top & ~exit_bot
            collide = moved & ~clipped

            # boundary crossing column (exit tallies + reflection)
            z_bnd = jnp.where(exit_top, z_max, z0)
            safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
            t_b = (z_bnd - z) / safe_uz
            xe = x0 + jnp.mod(x + ux * t_b - x0, lx)
            ye = y0 + jnp.mod(y + uy * t_b - y0, ly)
            ixe = jnp.clip(((xe - x0) * inv_dx).astype(jnp.int32),
                           0, nx - 1)
            iye = jnp.clip(((ye - y0) * inv_dy).astype(jnp.int32),
                           0, ny - 1)
            col_e = ixe * ny + iye

            # collision column / level
            xc = x0 + jnp.mod(x + ux * d - x0, lx)
            yc = y0 + jnp.mod(y + uy * d - y0, ly)
            zc = jnp.clip(zn, z0, z_max)
            ix = jnp.clip(((xc - x0) * inv_dx).astype(jnp.int32),
                          0, nx - 1)
            iy = jnp.clip(((yc - y0) * inv_dy).astype(jnp.int32),
                          0, ny - 1)
            iz = jnp.clip(((zc - z0) * inv_dz).astype(jnp.int32),
                          0, nz - 1)
            col = ix * ny + iy

            exits = exit_top | exit_bot
            colT = jnp.where(exits, col_e, col)
            if pending is not None:
                # pending refills borrow the collision gather + tally
                # slots (they neither move nor collide this step)
                colT = jnp.where(pending, col_b, colT)
                iz = jnp.where(pending, iz_b, iz)

            u_col = uniform(ctr, 4)
            u_ang = uniform(ctr, 5)
            u_phi = uniform(ctr, 6)
            phi_rot = 2.0 * np.pi * u_phi

            # ---- shared one-hots (gather AND tally) ----
            lo_c = jnp.bitwise_and(colT, 127)
            hi7_c = jnp.bitwise_and(jnp.right_shift(colT, 7), 127)
            sl_c = jnp.right_shift(colT, 14)
            cmp_lo = lo_c[:, None, :] == iota_sub
            ohs_f32 = cmp_lo.astype(jnp.float32)   # [blk, lo, p]
            ohs_bf = cmp_lo.astype(jnp.bfloat16)
            ohh_bf = (iota_hi3 == hi7_c[None, :, :]).astype(
                jnp.bfloat16)                       # [hi, blk, p]

            # per-slice MASKED hi one-hots, built once and shared by the
            # amplitude gather and the column tally (the per-slice mask
            # multiply is the minimal slice-decomposition cost: it rides
            # the 128-row hi side, not the 512-row value side)
            ohm = [[ohh_bf[:, b_i, :]
                    * (sl_c[b_i] == s).astype(jnp.bfloat16)[None, :]
                    for b_i in range(blk)] for s in range(n_sl)]

            # ---- amplitude gather (hi/lo split summed in-gather) ----
            if hifamp:
                # hi-first: one [256, n_sl*128] @ [n_sl*128, 128] dot per
                # block row pulls BOTH split fields' full lo-columns for
                # each lane's (slice, hi) row; the lo-mask reduce then
                # recombines hi+lo exactly (same table values as m_amp,
                # bitwise-equal amp)
                hi_full = jnp.right_shift(colT, 7)   # [blk, p]
                iota_hif = jax.lax.broadcasted_iota(
                    jnp.int32, (n_sl * 128, 128), 0)
                amp_rows = []
                for b_i in range(blk):
                    ohhi = (iota_hif == hi_full[b_i][None, :]).astype(
                        jnp.bfloat16)
                    t2 = jnp.dot(maT_ref[:], ohhi,
                                 preferred_element_type=jnp.float32)
                    amp_rows.append(jnp.sum(
                        (t2[:128] + t2[128:]) * ohs_f32[b_i], axis=0))
                amp = jnp.stack(amp_rows, axis=0)
            else:
                g3a = None
                for s in range(n_sl):
                    part = [jnp.dot(ma_ref[s * 256:(s + 1) * 256],
                                    ohm[s][b_i],
                                    preferred_element_type=jnp.float32)
                            for b_i in range(blk)]
                    p3 = jnp.stack(part, axis=0)  # [blk, 256, p]
                    g3a = p3 if g3a is None else g3a + p3
                amp = jnp.sum((g3a[:, 0:128] + g3a[:, 128:256]) * ohs_f32,
                              axis=1)
            if dblamp or dbltally:
                # index-perturbed one-hots for the duplicate copies (a
                # bit-flipped hi index: same shapes and sparsity, values
                # differ so neither XLA nor Mosaic can CSE the dots)
                # NB: index with [b_i][None, :] (two getitems) -- a mixed
                # (None, int, slice) getitem lowers to a gather primitive
                # Mosaic rejects on hardware (interpret mode accepts it)
                hi7_c2 = jnp.bitwise_xor(hi7_c, 1)
                ohm2 = [[(iota_hi3[:, b_i, :] == hi7_c2[b_i][None, :]
                          ).astype(jnp.bfloat16)
                         * (sl_c[b_i] == s).astype(jnp.bfloat16)[None, :]
                         for b_i in range(blk)] for s in range(n_sl)]
            if dblamp:
                g3d = None
                for s in range(n_sl):
                    part = [jnp.dot(ma_ref[s * 256:(s + 1) * 256],
                                    ohm2[s][b_i],
                                    preferred_element_type=jnp.float32)
                            for b_i in range(blk)]
                    p3 = jnp.stack(part, axis=0)
                    g3d = p3 if g3d is None else g3d + p3
                amp_d = jnp.sum((g3d[:, 0:128] + g3d[:, 128:256])
                                * ohs_f32, axis=1)
                nstat_ref[0, 2] = nstat_ref[0, 2] + jnp.sum(amp_d)

            if pending is not None:
                # group-rejection acceptance: gas-branch always; cloud
                # branch with probability amp[col]/gmax[group] (exact
                # marginal ~ amp; pad columns have amp 0). Rejected
                # lanes stay dead and re-propose next step.
                u_amp = uniform(ctr, 19)
                accept = pending & ((~cloud_br)
                                    | (u_amp * accept_gmax < amp))
                alive = alive | accept
                started = started + jnp.sum(accept.astype(jnp.float32))

            # ---- z-profile fields at the collision level ----
            izlo = jnp.bitwise_and(iz, 127)
            izhi = jnp.right_shift(iz, 7).astype(jnp.float32)  # 0/1
            ohz_bf = (izlo[:, None, :] == iota_sub).astype(jnp.bfloat16)
            zf_rows = [jnp.dot(mz_ref[:], ohz_bf[b_i],
                               preferred_element_type=jnp.float32)
                       for b_i in range(blk)]
            zf = jnp.stack(zf_rows, axis=0)  # [blk, 16, p]

            def zfield(r0):  # rows r0 (slice 0) / r0+1 (slice 1)
                return zf[:, r0] * (1.0 - izhi) + zf[:, r0 + 1] * izhi

            p_z = zfield(0) + zfield(2)
            q_z = zfield(4) + zfield(6)
            beta_c = amp * p_z          # cloud extinction
            beta = beta_c + q_z

            # ---- block-ceiling gather at the destination (<= 16384) ----
            bidx = ((ix // macro_f) * nby + iy // macro_f)
            blo = jnp.bitwise_and(bidx, 127)
            bhi = jnp.right_shift(bidx, 7)
            cmp_blo = blo[:, None, :] == iota_sub
            obs_f32 = cmp_blo.astype(jnp.float32)
            obh_bf = (iota_hi3 == bhi[None, :, :]).astype(jnp.bfloat16)
            gb = [jnp.dot(mb_ref[:], obh_bf[:, b_i, :],
                          preferred_element_type=jnp.float32)
                  for b_i in range(blk)]
            g_bs = jnp.sum(jnp.stack(gb, axis=0) * obs_f32, axis=1)
            bls = jnp.where(moved, g_bs, bls)

            # null-collision test against the ceiling this jump sampled
            real = collide & (u_col * ceiling < beta)
            # non-analog absorption by the cell's EFFECTIVE ssa: gas is a
            # pure absorber, so scattering power is beta_c * ssa_cloud
            ssa_eff = jnp.where(beta > 0, beta_c * ssa_c
                                / jnp.where(beta == 0, 1.0, beta), 0.0)
            absorbed = jnp.where(real, w * (1.0 - ssa_eff), 0.0)
            if lw and pending is not None:
                # LW emission pre-credit (flux-divergence accounting;
                # reference:
                # Integrators/monteCarloRadiativeTransfer.f95:504-508):
                # -1 at the birth column/level, folded into the net-
                # absorption tallies through the pending lane's slot
                # (colT=col_b, iz=iz_b; exact in bf16)
                absorbed = absorbed - accept.astype(jnp.float32)
            w = jnp.where(real, w * ssa_eff, w)

            # ---- Russian roulette ----
            if use_rr:
                u_rr = uniform(ctr, 7)
                play = real & (w < 0.5 * rr_w)
                survive = u_rr < w / rr_w
                w = jnp.where(play, jnp.where(survive, rr_w, 0.0), w)
            died_weight = real & (w <= _TINY)

            # ---- scattering: the cloud's single phase entry ----
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
                # single packed inverse-CDF row, hi-first layout
                # ([256, hp] f32 -- pallas_kernel._hif_gather2;
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
                           jnp.sign(jnp.where(oz == 0, 1.0, oz)) * 1e-4,
                           oz)
            inv_norm = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)
            ux = jnp.where(scatter, ox * inv_norm, ux)
            uy = jnp.where(scatter, oy * inv_norm, uy)
            uz = jnp.where(scatter, oz * inv_norm, uz)

            # ---- Lambertian surface reflection ----
            w_down = w
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
            bls = jnp.where(exit_bot, ceil_in_max, bls)

            alive = alive & ~exit_top & ~died_weight & ~died_surface

            x_ref[sl], y_ref[sl], z_ref[sl] = x, y, z
            ux_ref[sl], uy_ref[sl], uz_ref[sl] = ux, uy, uz
            w_ref[sl] = w
            quota_ref[sl] = quota
            if pending is not None:
                # rejected cloud-branch proposals carry state 2
                alive_ref[sl] = jnp.where(
                    alive, 1, jnp.where(pending & ~accept, 2, 0)
                ).astype(jnp.int32)
            else:
                alive_ref[sl] = alive.astype(jnp.int32)
            bls_ref[sl] = bls

            # ---- sectioned per-slice column tallies ----
            # acc rows [(s*4 + f)*128 + lo, hi]: f = 0 flux-up, 1 flux-
            # down, 2 net-absorption hi, 3 net-absorption lo. Values ride
            # the LO one-hot (built ONCE, [512, p] per block row) and the
            # slice decomposition rides the shared masked hi one-hots --
            # the old form replicated the value-bearing [512, blk, p]
            # operand per slice, 7x the VPU build traffic at equal MACs.
            dn_t = (((1,), (1,)), ((), ()))
            v_up = jnp.where(exit_top, w, 0.0)
            v_dn = jnp.where(exit_bot, w_down, 0.0)
            ab_h16 = absorbed.astype(jnp.bfloat16)
            ab_l16 = (absorbed - ab_h16.astype(jnp.float32)).astype(
                jnp.bfloat16)
            vu16 = v_up.astype(jnp.bfloat16)
            vd16 = v_dn.astype(jnp.bfloat16)
            vl = [jnp.concatenate([
                ohs_bf[b_i] * vu16[b_i][None, :],
                ohs_bf[b_i] * vd16[b_i][None, :],
                ohs_bf[b_i] * ab_h16[b_i][None, :],
                ohs_bf[b_i] * ab_l16[b_i][None, :],
            ], axis=0) for b_i in range(blk)]  # [512, p] each
            for s in range(n_sl):
                t_out = None
                for b_i in range(blk):
                    d_ = jax.lax.dot_general(
                        vl[b_i], ohm[s][b_i], dn_t,
                        preferred_element_type=jnp.float32)
                    t_out = d_ if t_out is None else t_out + d_
                acc_ref[s * 512:(s + 1) * 512] = (
                    acc_ref[s * 512:(s + 1) * 512] + t_out)
            if dbltally:
                # duplicate tally contraction against the perturbed hi
                # one-hots; the scalar sink keeps the dots live without
                # touching the real accumulator
                dsum = jnp.float32(0.0)
                for s in range(n_sl):
                    for b_i in range(blk):
                        d_ = jax.lax.dot_general(
                            vl[b_i], ohm2[s][b_i], dn_t,
                            preferred_element_type=jnp.float32)
                        dsum = dsum + jnp.sum(d_)
                nstat_ref[0, 3] = nstat_ref[0, 3] + dsum

            # ---- z-profile tally (net absorption over z) ----
            # accz rows: 0/1 abs hi (z slice 0/1), 2/3 abs lo, 4/5
            # emission pre-credits
            izh_i = jnp.right_shift(iz, 7)
            iota_r8 = jax.lax.broadcasted_iota(jnp.int32, (8, blk, 128), 0)
            az = jnp.where(iota_r8 == izh_i[None, :, :],
                           ab_h16[None, :, :], jnp.bfloat16(0))
            az = jnp.where(iota_r8 == (2 + izh_i)[None, :, :],
                           ab_l16[None, :, :], az)
            if lw and atm_emit is not None:
                # LW emission pre-credit (flux-divergence accounting;
                # reference:
                # Integrators/monteCarloRadiativeTransfer.f95:504-508):
                # -1 at the birth column + level, its own masked
                # contraction (the lane also moves this step)
                val_e16 = jnp.where(atm_emit, np.float32(-1.0),
                                    0.0).astype(jnp.bfloat16)
                izbh = jnp.right_shift(iz_b, 7)
                izbl = jnp.bitwise_and(iz_b, 127)
                ohzb = (izbl[:, None, :] == iota_sub).astype(jnp.bfloat16)
                az_b = jnp.where(iota_r8 == (4 + izbh)[None, :, :],
                                 val_e16[None, :, :], jnp.bfloat16(0))
                zb_out = None
                for b_i in range(blk):
                    d_ = jax.lax.dot_general(
                        az_b[:, b_i, :], ohzb[b_i], dn_t,
                        preferred_element_type=jnp.float32)
                    zb_out = d_ if zb_out is None else zb_out + d_
                accz_ref[:] = accz_ref[:] + zb_out
                # column pre-credit into the net-absorption sections
                lo_b2 = jnp.bitwise_and(col_b, 127)
                hi7_b2 = jnp.bitwise_and(jnp.right_shift(col_b, 7), 127)
                sl_b2 = jnp.right_shift(col_b, 14)
                ohs_b2 = (lo_b2[:, None, :] == iota_sub).astype(
                    jnp.bfloat16)
                ohh_b2 = (iota_hi3 == hi7_b2[None, :, :]).astype(
                    jnp.bfloat16)
                for s in range(n_sl):
                    mask_s = (sl_b2 == s).astype(jnp.bfloat16)
                    # value rides the lo one-hot; result is [lo, hi] to
                    # match the production tally orientation
                    a_e = ohs_b2 * (val_e16 * mask_s)[:, None, :]
                    e_out = None
                    for b_i in range(blk):
                        d_ = jax.lax.dot_general(
                            a_e[b_i], ohh_b2[:, b_i, :], dn_t,
                            preferred_element_type=jnp.float32)
                        e_out = d_ if e_out is None else e_out + d_
                    base = s * 512 + 256  # the abs-hi section (-1 exact)
                    acc_ref[base:base + 128] = (acc_ref[base:base + 128]
                                                + e_out)
            zout = None
            for b_i in range(blk):
                d_ = jax.lax.dot_general(az[:, b_i, :], ohz_bf[b_i], dn_t,
                                         preferred_element_type=jnp.float32)
                zout = d_ if zout is None else zout + d_
            accz_ref[:] = accz_ref[:] + zout

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


def _pack_sep_inverse(domain: OpticalDomain):
    """Single-row inverse-CDF pack for the cloud's tabulated phase entry
    (delegates to pallas_kernel._pack_inverse_row; hi-first layout)."""
    from mcbrat3d_tpu.transport.pallas_kernel import _pack_inverse_row
    return _pack_inverse_row(domain, domain.sep_inv_row, hif=True)


def run_batch_pallas_sep(domain: OpticalDomain,
                         surface: Surface,
                         source: illumination.Source,
                         key: jax.Array,
                         pcfg: PallasConfig,
                         photons_per_lane: int,
                         n_photons=None,
                         use_russian_roulette: bool = True,
                         russian_roulette_weight: float = 1.0,
                         lw_mode: bool = False):
    """One photon batch through the separable-template megakernel.

    Returns (flux_up [nx,ny], flux_down [nx,ny], abs_col [nx,ny] (NET of
    LW emission pre-credits), abs_profile [nz] (net), n_started, n_bad,
    n_calls).
    """
    grid = domain.grid
    nx, ny, nz = grid.shape
    nxy = nx * ny
    rows = pcfg.rows
    n_lanes = pcfg.n_lanes
    if n_lanes * photons_per_lane >= 2 ** 31:
        raise ValueError("quota budget overflows int32; split batches")

    m_amp, m_ampT, m_blk, m_z, n_sl, nbx, nby = _obj_cache(
        domain, ("sep",), lambda: _pack_sep_tables(domain))
    analytic_hg = bool(domain.sep_analytic_hg)
    if analytic_hg:
        inv_packed = jnp.zeros((24, 128), jnp.bfloat16)
        inv_hp, inv_n_steps = 8, 0
    else:
        inv_packed, inv_hp, inv_n_steps = _obj_cache(
            domain, ("sepinv",), lambda: _pack_sep_inverse(domain))
    lw = bool(lw_mode) and source.kind == illumination.EMISSION
    oldem = "oldem" in frozenset(pcfg.debug_parts.split(","))
    if source.kind == illumination.EMISSION:
        atms_frac = source.atms_fraction
        m_eg = None
        if not oldem:
            m_eg = _obj_cache(
                domain, ("sepeg",),
                lambda: _pack_sep_emission_groups(domain))
            if m_eg is None:  # no host amp copy available under trace
                oldem = True
                pcfg = dataclasses.replace(
                    pcfg, debug_parts=(pcfg.debug_parts + ",oldem"
                                       if pcfg.debug_parts else "oldem"))
        if oldem:
            m_ea, m_eaz, p_branch = _obj_cache(
                domain, ("sepea", n_sl),
                lambda: _pack_sep_emission(domain, n_sl))
            m_eg = jnp.zeros((24, 128), jnp.float32)
        else:
            # group-rejection refill: no per-column alias upload
            m_eaz, p_branch = _obj_cache(
                domain, ("sepeaz",),
                lambda: _pack_sep_emission_z(domain))
            m_ea = jnp.zeros((16, 128), jnp.bfloat16)
    else:
        m_ea = jnp.zeros((16, 128), jnp.bfloat16)
        m_eaz = jnp.zeros((16, 128), jnp.bfloat16)
        m_eg = jnp.zeros((24, 128), jnp.float32)
        p_branch, atms_frac = np.float32(0.0), 0.0

    macro_f = domain.macro_factor if domain.macro_factor > 0 else max(nx,
                                                                      ny)
    kernel = _build_kernel_sep(
        (nx, ny, nz), pcfg, source.kind, use_russian_roulette,
        n_sl, macro_f, nbx, nby, domain.sep_zb, domain.sep_zt, lw,
        analytic_hg=analytic_hg, inv_hp=inv_hp, inv_n_steps=inv_n_steps)

    sc = domain.sep_scalars
    gmax = jnp.maximum(jnp.maximum(sc[2], sc[3]),
                       jnp.maximum(sc[4], _TINY))
    if source.kind in (illumination.DIRECTIONAL,
                       illumination.RANDOM_AZIMUTH):
        smu = source.solar_mu
        sphi = (source.solar_azimuth
                if source.kind == illumination.DIRECTIONAL else 0.0)
    else:
        smu, sphi = 0.0, 0.0
    ge = grid.x_edges, grid.y_edges, grid.z_edges
    params = jnp.stack([
        gmax,
        surface.params.reshape(-1)[0],
        jnp.asarray(smu, jnp.float32), jnp.asarray(sphi, jnp.float32),
        jnp.float32(russian_roulette_weight),
        ge[0][0], ge[0][-1] - ge[0][0],
        ge[1][0], ge[1][-1] - ge[1][0],
        ge[2][0], ge[2][-1] - ge[2][0],
        sc[0], sc[1],            # ssa_cloud, g_cloud
        sc[2], sc[3], sc[4],     # q_below, q_above, ceil_in_max
        jnp.float32(0.0),
        jnp.asarray(atms_frac, jnp.float32),
        jnp.asarray(p_branch, jnp.float32),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.float32(smu) ** 2))
        * jnp.cos(jnp.float32(sphi)),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.float32(smu) ** 2))
        * jnp.sin(jnp.float32(sphi)),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
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
        bls=jnp.broadcast_to(sc[4].astype(jnp.float32), (rows, 128)),
    )
    acc0 = jnp.zeros((n_sl * 512, 128), jnp.float32)
    accz0 = jnp.zeros((8, 128), jnp.float32)

    keys = ("x", "y", "z", "ux", "uy", "uz", "w", "quota", "alive", "bls")
    n_state = len(keys)
    grid_spec = pl.GridSpec(
        grid=(pcfg.steps_per_call, rows // pcfg.block_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 10),
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 2)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
    )
    state_shapes = [
        jax.ShapeDtypeStruct((rows, 128),
                             jnp.int32 if k in ("quota", "alive")
                             else jnp.float32)
        for k in keys]
    out_shape = state_shapes + [
        jax.ShapeDtypeStruct((n_sl * 512, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, 8), jnp.float32),
    ]
    aliases = {2 + i: i for i in range(n_state)}
    aliases[2 + n_state + 8] = n_state      # acc
    aliases[2 + n_state + 9] = n_state + 1  # accz

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
        state, acc, accz, n_started, n_calls, work = carry
        return work & (n_calls * pcfg.steps_per_call < pcfg.max_steps)

    def body(carry):
        state, acc, accz, n_started, n_calls, work = carry
        scal = jnp.stack([seed, n_calls * pcfg.steps_per_call]).astype(
            jnp.int32)
        outs = call(scal, params, *[state[k] for k in keys],
                    m_amp, m_ampT, m_blk, m_z, m_ea, m_eaz, m_eg,
                    inv_packed, acc, accz)
        new_state = dict(zip(keys, outs[:n_state]))
        acc = outs[n_state]
        accz = outs[n_state + 1]
        stats = outs[n_state + 2]
        n_started = n_started + stats[0, 0].astype(jnp.int32)
        work = stats[0, 1] > 0
        q = new_state["quota"]
        total_q = jnp.sum(q)
        lane_i = (jnp.arange(rows, dtype=jnp.int32)[:, None] * 128
                  + jnp.arange(128, dtype=jnp.int32)[None, :])
        new_state["quota"] = (total_q // n_lanes) + (
            lane_i < (total_q % n_lanes)).astype(jnp.int32)
        return (new_state, acc, accz, n_started, n_calls + 1, work)

    carry = (state0, acc0, accz0, jnp.int32(0), jnp.int32(0),
             jnp.bool_(True))
    state_f, acc_f, accz_f, n_started, n_calls, _ = jax.lax.while_loop(
        cond, body, carry)

    # sections: col = s*16384 + hi7*128 + lo; acc rows are [lo, hi]
    # (values ride the lo one-hot in-kernel) so transpose before the
    # flat col-order reshape
    def section(f):
        parts = [acc_f[(s * 4 + f) * 128:(s * 4 + f + 1) * 128].T
                 .reshape(-1) for s in range(n_sl)]
        return jnp.concatenate(parts)[:nxy].reshape(nx, ny)

    flux_up = section(0)
    flux_down = section(1)
    abs_col = section(2) + section(3)
    abs_profile = (jnp.concatenate([accz_f[0], accz_f[1]])
                   + jnp.concatenate([accz_f[2], accz_f[3]])
                   + jnp.concatenate([accz_f[4], accz_f[5]]))[:nz]
    # state 1 = started but unfinished; state 2 = a claimed-but-never-
    # accepted emission proposal (both are lost work at max_steps)
    n_bad = jnp.sum((state_f["alive"] > 0).astype(jnp.int32),
                    dtype=jnp.int32)
    return (flux_up, flux_down, abs_col, abs_profile,
            n_started, n_bad, n_calls)


def run_batch_pallas_sep_tallies(domain, surface, source, key, config,
                                 n_photons=None, interpret: bool = False):
    """run_batch-compatible entry returning transport.integrator.Tallies
    (volume_absorption is None; absorption_profile carries the net z
    marginal including LW emission pre-credits)."""
    from mcbrat3d_tpu.transport.integrator import Tallies
    from mcbrat3d_tpu.transport.pallas_kernel import config_for

    pcfg, ppl = config_for(config.n_lanes, config.photons_per_lane,
                           config.max_steps, interpret)
    # the sliced gathers materialize [blk, 128, 128] transients per slice;
    # cap the block size to bound the VMEM transient
    if pcfg.block_rows > 16:
        import dataclasses as _dc
        pcfg = _dc.replace(pcfg, block_rows=16)
    if n_photons is None:
        n_photons = config.photons_per_batch
    fu, fd, ac, az, n_started, n_bad, n_calls = run_batch_pallas_sep(
        domain, surface, source, key, pcfg, ppl, n_photons=n_photons,
        use_russian_roulette=config.use_russian_roulette,
        russian_roulette_weight=config.russian_roulette_weight,
        lw_mode=config.lw_mode)
    return Tallies(
        flux_up=fu, flux_down=fd,
        flux_absorbed=ac,
        volume_absorption=None,
        absorption_profile=az,
        n_photons=n_started, n_bad=n_bad,
        n_steps=n_calls * pcfg.steps_per_call,
    )
