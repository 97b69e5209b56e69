"""The optical domain: per-cell solver arrays + stacked phase tables.

Re-design of the reference's domain model (reference:
src/opticalProperties.f95:63-142). Components are added with 1D
(horizontally uniform) or 3D extinction/albedo/phase-index fields and a
``z_level_base`` sub-range; ``flatten`` produces the four per-cell arrays the
transport kernel reads (total extinction, fractional cumulative extinction
per component, single-scattering albedo per component, phase-function index
per component; reference: src/opticalProperties.f95:966-1072
getOpticalPropertiesByComponent).

TPU-first deltas from the reference:
  * All per-component phase-function tables are stacked into single device
    matrices with per-component row offsets, so the kernel's per-event
    lookup is one flattened gather instead of a per-component pointer chase.
  * The inverse-CDF and forward matrices are padded to a common width at
    build time (static shapes for XLA).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.physics.phase_function import PhaseFunctionTable, forward_tabulate
from mcbrat3d_tpu.physics.inverse_cdf import inverse_cdf_table
from mcbrat3d_tpu.physics.hybrid import hybrid_phase_values


@dataclasses.dataclass
class OpticalComponent:
    """One optical component (cloud, aerosol, gas, Rayleigh...).

    ``extinction``/``single_scattering_albedo``/``phase_function_index`` are
    [nx, ny, nzc] or [1, 1, nzc] (horizontally uniform, spread at flatten
    time; reference: src/opticalProperties.f95:1033-1043). ``z_level_base``
    is the 0-based z index of the first occupied level
    (reference: addOpticalComponent, src/opticalProperties.f95:557-730).
    Phase-function indices are 0-based into ``phase_function_table``.
    """

    name: str
    extinction: np.ndarray
    single_scattering_albedo: np.ndarray
    phase_function_index: np.ndarray
    phase_function_table: PhaseFunctionTable
    z_level_base: int = 0

    def __post_init__(self):
        self.extinction = np.atleast_3d(np.asarray(self.extinction, np.float64))
        self.single_scattering_albedo = np.atleast_3d(
            np.asarray(self.single_scattering_albedo, np.float64))
        self.phase_function_index = np.atleast_3d(
            np.asarray(self.phase_function_index, np.int32))
        if not (self.extinction.shape == self.single_scattering_albedo.shape
                == self.phase_function_index.shape):
            raise ValueError(f"component '{self.name}': field shapes disagree")
        if np.any(self.extinction < 0):
            raise ValueError(f"component '{self.name}': negative extinction")
        if (np.any(self.single_scattering_albedo < 0)
                or np.any(self.single_scattering_albedo > 1)):
            raise ValueError(f"component '{self.name}': SSA outside [0,1]")
        n = self.phase_function_table.n_entries
        if (np.any(self.phase_function_index < 0)
                or np.any(self.phase_function_index >= n)):
            raise ValueError(f"component '{self.name}': phase index out of range")

    @property
    def is_horizontally_uniform(self) -> bool:
        return self.extinction.shape[0] == 1 and self.extinction.shape[1] == 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceTables:
    """Stacked phase-function matrices on device.

    ``inverse``: [total_entries, n_cdf_steps] scattering angle vs CDF.
    ``forward``: [total_entries, n_angles] hybridized phase values (radiance
    path) -- zeros-sized placeholder when intensity is off.
    ``forward_orig``: same, original (non-hybrid) values.
    ``offsets``: [ncomp] row offset of each component's table.
    """

    inverse: jax.Array
    forward: jax.Array
    forward_orig: jax.Array
    offsets: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpticalDomain:
    """Device-resident flattened domain consumed by the transport kernel.

    ``cell_records`` packs everything a collision needs into one row so the
    hot loop performs a *single* gather per event instead of one per field
    (TPU gathers cost per-index, not per-byte). Layout, with C = ncomp:
      [0]              total extinction
      [1]              local majorant: max extinction over the cell's
                       macro-cell neighborhood (the fine-grained Woodcock
                       ceiling; equals the global max when macro_factor=0)
      [2        : 2+C] fractional cumulative extinction per component
      [2 + C    : 2+2C] single-scattering albedo per component
      [2 + 2C   : 2+3C] phase-function index per component (as float)
      [2 + 3C   : 2+4C] HG asymmetry g per component's active entry
                        (used by the analytic sampling path when ``all_hg``)
    """

    grid: Grid
    total_ext: jax.Array  # [nx, ny, nz] f32
    cum_ext: jax.Array  # [nx, ny, nz, ncomp] f32, fractional, last == 1
    ssa: jax.Array  # [nx, ny, nz, ncomp] f32
    phase_index: jax.Array  # [nx, ny, nz, ncomp] i32, 0-based per-component
    cell_records: jax.Array  # [nx*ny*nz, 2 + 4*ncomp] f32
    tables: DeviceTables
    all_hg: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Spatial-uniformity flags (static, detected at build time): when the
    # single-scattering albedo / HG asymmetry is the same in every occupied
    # cell, kernels read it from one scalar instead of the per-cell gather.
    uniform_ssa: bool = dataclasses.field(metadata=dict(static=True),
                                          default=False)
    uniform_hg: bool = dataclasses.field(metadata=dict(static=True),
                                         default=False)
    # Macro-cell majorant grid (two-level Woodcock): number of fine cells
    # per macro cell along each axis; 0 disables the local-majorant field.
    macro_factor: int = dataclasses.field(metadata=dict(static=True), default=0)
    temps: Optional[jax.Array] = None  # [nx, ny, nz] f32 (broadband/LW)
    # Wavelength is a pytree LEAF, not a static field: broadband loops
    # sweep per-bin domains through one jitted launch, and a static
    # lambda_um would retrace + recompile the megakernel for EVERY bin
    # (measured ~30 s/bin at 64x64x150). Only host-side setup code reads
    # it (float(domain.lambda_um)); nothing branches on it in-trace.
    lambda_um: float = 0.0
    # Column-template structure (big-domain megakernel fast path; detected
    # at build time): extinction is exactly
    #   beta(x, y, z) = col_scale[ix*ny+iy] * (iz < col_height[ix*ny+iy]),
    # the shape of the reference's Landsat-style scenes
    # (reference: Domain-Files/i3rcLandsatCloud.f95:82-90). The per-cell
    # record table is then redundant: the kernel gathers two per-COLUMN
    # values instead of per-cell records, which keeps the factorized
    # one-hot machinery within its 16384-entry envelope for domains of
    # millions of cells.
    col_scale: Optional[jax.Array] = None    # [nx*ny] f32
    col_height: Optional[jax.Array] = None   # [nx*ny] f32 (cells, from z=0)
    # Column-template BBEmission sampling tables (host-built like the
    # sep_em_* set): the emission density (1-ssa)*scale[col]*[z<h[col]]
    # * B(T(z)) factorizes into a column Walker alias over
    # w[col] = scale[col]*Fcum[h[col]-1] and a per-column z draw by
    # inverting the cumulative Planck table TRUNCATED at the column's
    # height: z = #{k: Fcum[k] <= u * Fcum[h-1]}. Built when
    # col_template, z-uniform temps, uniform ssa and lambda_um > 0.
    col_em_prob: Optional[jax.Array] = None   # [nx*ny] f32 alias P
    col_em_alias: Optional[jax.Array] = None  # [nx*ny] f32 alias targets
    col_em_halias: Optional[jax.Array] = None  # [nx*ny] f32 h[alias[col]]
    col_em_fcum: Optional[jax.Array] = None   # [nz] f32 cum B(T(z))
    # Two-component column template: cloud (col_scale/col_height) plus a
    # horizontally uniform PURE-ABSORBER gas profile,
    #   beta = col_scale[col]*(iz < col_height[col]) + col_qz[iz].
    # Only detected when cloud heights VARY (uniform-height slabs +
    # gas belong to the separable kernel, which also covers their LW).
    col_qz: Optional[jax.Array] = None        # [nz] f32 gas profile
    # (ssa_cloud, g_cloud_or_0, qmax) -- the kernel's uniform scalars
    col_cloud: Optional[jax.Array] = None     # [3] f32
    col_analytic_hg: bool = dataclasses.field(metadata=dict(static=True),
                                              default=True)
    col_inv_row: int = dataclasses.field(metadata=dict(static=True),
                                         default=0)
    macro_table: Optional[jax.Array] = None  # [nbx*nby*nbz] f32 majorants
    col_template: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    # Separable-template structure (flagship-scale megakernel fast path;
    # detected at build time): total extinction decomposes EXACTLY (to f32
    # rounding) as
    #   beta(x, y, z) = sep_amp[ix*ny+iy] * sep_pz[iz] + sep_qz[iz],
    # the shape of stratocumulus-over-gas longwave scenes (a rank-1
    # "cloud" component times a vertical profile, plus a horizontally
    # uniform absorber). This generalizes col_template (p = indicator,
    # q = 0) and covers the reference's 325x325x150 broadband-LW
    # benchmark domain (reference: run/I3RC_bench_LW.deck:45) whose 15.8M
    # cells exceed every per-cell VMEM envelope: the kernel gathers ONE
    # per-column amplitude and reads tiny per-z profile tables instead of
    # per-cell records (transport/pallas_sep.py).
    sep_amp: Optional[jax.Array] = None      # [nx*ny] f32
    sep_pz: Optional[jax.Array] = None       # [nz] f32 (cloud profile)
    sep_qz: Optional[jax.Array] = None       # [nz] f32 (uniform absorber)
    sep_block: Optional[jax.Array] = None    # [nbx*nby] f32 block max amp
    sep_tz: Optional[jax.Array] = None       # [nz] f32 temps (z-uniform)
    # [ssa_cloud, g_cloud, qmax_below, qmax_above, ceil_in_max, amp_max]
    sep_scalars: Optional[jax.Array] = None  # [6] f32
    sep_template: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    sep_zb: int = dataclasses.field(metadata=dict(static=True), default=0)
    sep_zt: int = dataclasses.field(metadata=dict(static=True), default=0)
    # cloud scattering: analytic HG (sep_scalars[1]) vs the single
    # tabulated inverse-CDF row sep_inv_row of tables.inverse
    sep_analytic_hg: bool = dataclasses.field(metadata=dict(static=True),
                                              default=False)
    sep_inv_row: int = dataclasses.field(metadata=dict(static=True),
                                         default=0)
    # temps are horizontally uniform (LW emission factorizes over z)
    sep_tz_uniform: bool = dataclasses.field(metadata=dict(static=True),
                                             default=False)
    # Separable BBEmission sampling tables, built HERE (host side, the
    # Walker alias construction is sequential -- native/alias.cpp) so the
    # in-trace kernel packing stays pure jnp. The emission density
    # factorizes (z-uniform temps): kabs * B(T(z)) = a[col]*P1[z] + Q1[z]
    # with P1 = p*(1-ssa_cloud)*B(T), Q1 = q*B(T). Branch "cloud" samples
    # the column from a's alias and z from P1's; branch "gas" samples the
    # column uniformly and z from Q1's. Only built when sep_template,
    # sep_tz_uniform and lambda_um > 0.
    sep_em_prob: Optional[jax.Array] = None   # [nx*ny] f32 column alias P
    sep_em_alias: Optional[jax.Array] = None  # [nx*ny] f32 column targets
    sep_em_zpa: Optional[jax.Array] = None    # [4, nz] cloudP,cloudA,gasP,gasA
    sep_em_pb: Optional[jax.Array] = None     # [1] f32 P(cloud branch)
    # Component count when the per-cell fields are absent
    # (build_domain(device_fields="compact") skips the 3D device arrays:
    # a flagship bin is ~1 GB of cell records/cum_ext/ssa/phase_index
    # uploads the separable megakernel never reads).
    ncomp_hint: int = dataclasses.field(metadata=dict(static=True),
                                        default=0)

    @property
    def n_components(self) -> int:
        if self.cum_ext is not None:
            return self.cum_ext.shape[-1]
        return self.ncomp_hint

    @property
    def max_extinction(self):
        return jnp.max(self.total_ext)


_SEP_NONE = dict(sep_amp=None, sep_pz=None, sep_qz=None, sep_block=None,
                 sep_tz=None, sep_scalars=None, sep_template=False,
                 sep_zb=0, sep_zt=0, sep_analytic_hg=False, sep_inv_row=0,
                 sep_tz_uniform=False, sep_em_prob=None, sep_em_alias=None,
                 sep_em_zpa=None, sep_em_pb=None, _sep_em_atm=0.0)


def _sep_emission_tables(a, p, q, tz, ssa_cloud, lambda_um, nxy, nz,
                         dz_km, col_alias=None):
    """Host-side separable BBEmission aliases (see OpticalDomain.sep_em_*).

    Reference sampling being replaced: the 3-level CDF scan of
    src/monteCarloIllumination.f95:495-498 over 15.8M voxels becomes one
    column alias + two z aliases (O(1) draws, ~1 MB instead of 250 MB).

    ``col_alias``: optional precomputed (prob, alias) over the normalized
    column amplitudes -- the only O(nxy) piece, and lambda-INDEPENDENT, so
    broadband loops build it once (domain/sep_plan.py) and every later
    bin's emission tables are O(nz)."""
    from mcbrat3d_tpu.core.planck import planck_radiance
    from mcbrat3d_tpu.sources.illumination import _walker_alias

    b = np.where(tz > 0, planck_radiance(lambda_um, np.maximum(tz, 1.0)),
                 0.0)
    p1 = p * (1.0 - ssa_cloud) * b
    q1 = q * b
    w_cloud = float(a.sum() * p1.sum())
    w_gas = float(nxy * q1.sum())
    tot = w_cloud + w_gas
    pb = w_cloud / tot if tot > 0 else 0.0
    # Total atmospheric emission, summed over all voxels in
    # emission_weighting's units (contribution = 4 pi B kabs dz,
    # kabs = a*p*(1-ssa) + q): the factorized equivalent of its
    # 15.8M-voxel Kahan scan, used by illumination.emission_separable
    # for the atmosphere/surface power split (fracAtmsPower; reference:
    # src/monteCarloIllumination.f95:457-522).
    atm_total = 4.0 * np.pi * float(dz_km) * tot
    if col_alias is not None:
        prob_c, alias_c = col_alias
    else:
        asum = a.sum()
        prob_c, alias_c = _walker_alias(
            a / asum if asum > 0 else np.full(nxy, 1.0 / nxy))

    def z_alias(dens):
        s = dens.sum()
        return _walker_alias(dens / s if s > 0 else np.full(nz, 1.0 / nz))

    zp_c, za_c = z_alias(p1)
    zp_g, za_g = z_alias(q1)
    return dict(
        sep_em_prob=jnp.asarray(prob_c, jnp.float32),
        sep_em_alias=jnp.asarray(alias_c, jnp.float32),
        sep_em_zpa=jnp.asarray(
            np.stack([zp_c, za_c, zp_g, za_g]), jnp.float32),
        sep_em_pb=jnp.asarray([pb], jnp.float32),
        _sep_em_atm=atm_total)


def _sep_blockmax(a, nx, ny, macro_factor):
    """Per-xy-macro-block max of the column amplitude field [nbx, nby]."""
    f = macro_factor if macro_factor > 0 else max(nx, ny)
    nbx, nby = -(-nx // f), -(-ny // f)
    a2 = np.zeros((nbx * f, nby * f), np.float32)
    a2[:nx, :ny] = a
    return a2.reshape(nbx, f, nby, f).max(axis=(1, 3))


def _sep_block_ceiling(blockmax, pmax, qmax_slab):
    """In-slab extinction ceiling per block, bumped UP so the bound
    survives the kernel's bf16 table (same scheme as the column-template
    table)."""
    import ml_dtypes
    bceil = blockmax * pmax + qmax_slab
    b16 = bceil.astype(ml_dtypes.bfloat16).astype(np.float32)
    bump = (bceil * (1.0 + 2.0 ** -6)).astype(
        ml_dtypes.bfloat16).astype(np.float32)
    return np.where(b16 < bceil, bump, b16)


def _detect_separable(grid, components, ext, ssa, pfi, all_hg,
                      macro_factor, temps, col_template, lambda_um=0.0):
    """Detect beta = a[x,y] * p[z] + q[z] (see OpticalDomain.sep_* docs).

    Requirements beyond the algebraic shape: the rank-1 "cloud" component
    has ONE phase entry and a uniform ssa over occupied cells; the
    horizontally uniform "gas" component (if present) is a pure absorber
    (ssa == 0, so scattering is always the cloud's phase function). Up to
    131072 columns (bf16 hi/lo alias splits stay integer-exact) and 256
    z-levels.
    """
    nx, ny, nz = grid.shape
    ncomp = len(components)
    if (col_template or ncomp > 2 or nz > 256 or nx * ny > 131072
            or not (grid.xy_regular and grid.z_regular)):
        return dict(_SEP_NONE)
    uniform = [bool(np.all(ext[:, :, :, c] == ext[:1, :1, :, c]))
               for c in range(ncomp)]
    if ncomp == 2:
        if uniform[0] == uniform[1]:
            return dict(_SEP_NONE)
        cloud_c, gas_c = (1, 0) if uniform[0] else (0, 1)
    else:
        if uniform[0]:
            return dict(_SEP_NONE)
        cloud_c, gas_c = 0, None

    e_c = np.asarray(ext[:, :, :, cloud_c], np.float32)
    occ_c = e_c > 0
    if not occ_c.any():
        return dict(_SEP_NONE)
    # gas must be a pure absorber (else the scattering component would
    # depend on position and the single-phase kernel would be biased)
    if gas_c is not None:
        q = np.asarray(ext[0, 0, :, gas_c], np.float32)
        occ_g = ext[:, :, :, gas_c] > 0
        if occ_g.any() and float(np.abs(ssa[:, :, :, gas_c][occ_g]).max()) > 0:
            return dict(_SEP_NONE)
    else:
        q = np.zeros(nz, np.float32)

    # rank-1 factorization from the strongest column
    ij = np.unravel_index(np.argmax(e_c.sum(axis=2)), (nx, ny))
    p = e_c[ij[0], ij[1], :].astype(np.float32)
    zref = int(np.argmax(p))
    if p[zref] <= 0:
        return dict(_SEP_NONE)
    a = (e_c[:, :, zref] / p[zref]).astype(np.float32)
    # columns with zero amplitude at zref must be empty columns
    if bool(np.any(occ_c.any(axis=2) & (a <= 0))):
        return dict(_SEP_NONE)
    approx = a[:, :, None] * p[None, None, :]
    tol = 4e-6 * float(e_c.max())
    if not bool(np.all(np.abs(e_c - approx) <= tol + 4e-6 * approx)):
        return dict(_SEP_NONE)

    # cloud uniformity: one ssa, one phase entry over occupied cells
    ssa_c_vals = ssa[:, :, :, cloud_c][occ_c]
    pfi_c_vals = pfi[:, :, :, cloud_c][occ_c]
    if (not bool(np.all(ssa_c_vals == ssa_c_vals.flat[0]))
            or not bool(np.all(pfi_c_vals == pfi_c_vals.flat[0]))):
        return dict(_SEP_NONE)
    ssa_cloud = float(ssa_c_vals.flat[0])
    entry = int(pfi_c_vals.flat[0])
    tbl = components[cloud_c].phase_function_table
    g_cloud = tbl.phase_functions[entry].hg_g
    analytic = g_cloud is not None
    offset = sum(components[c].phase_function_table.n_entries
                 for c in range(cloud_c))
    inv_row = offset + entry

    # slab bounds + region ceilings
    nzp = np.nonzero(p > 0)[0]
    zb, zt = int(nzp[0]), int(nzp[-1]) + 1
    qmax_below = float(q[:zb].max()) if zb > 0 else 0.0
    qmax_above = float(q[zt:].max()) if zt < nz else 0.0
    qmax_slab = float(q[zb:zt].max())
    pmax = float(p.max())

    # per-xy-block in-slab ceilings (bumped UP so the bound survives the
    # kernel's bf16 table; same scheme as the column-template table)
    bceil16 = _sep_block_ceiling(
        _sep_blockmax(a, nx, ny, macro_factor), pmax, qmax_slab)
    ceil_in_max = float(bceil16.max())

    tz_uniform = False
    tz = np.zeros(nz, np.float32)
    if temps is not None:
        t = np.asarray(temps)
        tz_uniform = bool(np.all(t == t[0:1, 0:1, :]))
        if tz_uniform:
            tz = t[0, 0, :].astype(np.float32)

    em = dict(sep_em_prob=None, sep_em_alias=None, sep_em_zpa=None,
              sep_em_pb=None, _sep_em_atm=0.0)
    if tz_uniform and lambda_um > 0.0:
        ze = grid.edges_np()[2]
        em = _sep_emission_tables(
            a.reshape(-1).astype(np.float64), p.astype(np.float64),
            q.astype(np.float64), tz.astype(np.float64), ssa_cloud,
            float(lambda_um), nx * ny, nz,
            dz_km=(ze[-1] - ze[0]) / nz)

    return dict(
        **em,
        _sep_amp_np=a.reshape(-1).astype(np.float64),
        sep_amp=jnp.asarray(a.reshape(-1), jnp.float32),
        sep_pz=jnp.asarray(p, jnp.float32),
        sep_qz=jnp.asarray(q, jnp.float32),
        sep_block=jnp.asarray(bceil16.reshape(-1), jnp.float32),
        sep_tz=jnp.asarray(tz, jnp.float32),
        sep_scalars=jnp.asarray(
            [ssa_cloud, float(g_cloud) if analytic else 0.0,
             qmax_below, qmax_above, ceil_in_max, float(a.max())],
            jnp.float32),
        sep_template=True, sep_zb=zb, sep_zt=zt,
        sep_analytic_hg=bool(analytic), sep_inv_row=inv_row,
        sep_tz_uniform=tz_uniform)


def _build_device_tables(phase_tables, n_cdf_steps: int,
                         n_forward_angles: int,
                         compute_intensity_tables: bool,
                         hybrid_width_deg: float) -> "DeviceTables":
    """Stack per-component phase tables into the solver's device tables
    (inverse-CDF rows; forward rows when radiance is computed)."""
    inv_list, fwd_list, offsets = [], [], []
    row = 0
    angles = np.linspace(0.0, np.pi, n_forward_angles)
    for tbl in phase_tables:
        offsets.append(row)
        row += tbl.n_entries
        inv_list.append(inverse_cdf_table(tbl, n_cdf_steps))
        if compute_intensity_tables:
            fwd_list.append(forward_tabulate(tbl, n_forward_angles))
    inverse = np.concatenate(inv_list, axis=0)

    if compute_intensity_tables:
        forward_orig = np.concatenate(fwd_list, axis=0)
        if hybrid_width_deg > 0.0:
            forward = hybrid_phase_values(angles, forward_orig,
                                          hybrid_width_deg)
        else:
            forward = forward_orig
    else:
        forward_orig = np.zeros((row, 1), np.float64)
        forward = forward_orig

    return DeviceTables(
        inverse=jnp.asarray(inverse, jnp.float32),
        forward=jnp.asarray(forward, jnp.float32),
        forward_orig=jnp.asarray(forward_orig, jnp.float32),
        offsets=jnp.asarray(np.asarray(offsets, np.int32)),
    )


def build_domain(grid: Grid, components: Sequence[OpticalComponent],
                 n_cdf_steps: int = 9001,
                 n_forward_angles: int = 1801,
                 compute_intensity_tables: bool = False,
                 hybrid_width_deg: float = 0.0,
                 temps: Optional[np.ndarray] = None,
                 lambda_um: float = 0.0,
                 macro_factor: int = 0,
                 device_fields: str = "full") -> OpticalDomain:
    """Flatten components into the solver arrays and stack phase tables.

    Cumulative extinction is *fractional*: cum_ext[..., -1] == 1 wherever
    total extinction is positive (reference:
    src/opticalProperties.f95:1055-1061); component selection in the kernel
    bisects a uniform deviate against it.

    ``device_fields="compact"`` skips the per-cell device arrays
    (total_ext/cum_ext/ssa/phase_index/cell_records/temps are None) and
    builds ONLY the separable-template tables: a flagship 325x325x150 bin
    is ~1 GB of device uploads the separable megakernel never reads, so
    broadband loops rebuild per-bin domains compactly once the sep path is
    confirmed. Raises if the domain is not separable; a compact domain is
    usable only by transport/pallas_sep.py (run_batch rejects it
    elsewhere).
    """
    if not components:
        raise ValueError("need at least one optical component")
    if device_fields not in ("full", "compact"):
        raise ValueError(f"device_fields={device_fields!r} "
                         "(expected 'full' or 'compact')")
    nx, ny, nz = grid.shape
    ncomp = len(components)

    ext = np.zeros((nx, ny, nz, ncomp), np.float64)
    ssa = np.zeros((nx, ny, nz, ncomp), np.float64)
    pfi = np.zeros((nx, ny, nz, ncomp), np.int32)

    for c, comp in enumerate(components):
        e = comp.extinction
        a = comp.single_scattering_albedo
        p = comp.phase_function_index
        if comp.is_horizontally_uniform:
            e = np.broadcast_to(e, (nx, ny, e.shape[2]))
            a = np.broadcast_to(a, (nx, ny, a.shape[2]))
            p = np.broadcast_to(p, (nx, ny, p.shape[2]))
        z0 = comp.z_level_base
        z1 = z0 + e.shape[2]
        if z1 > nz:
            raise ValueError(f"component '{comp.name}' extends past the domain top")
        ext[:, :, z0:z1, c] = e
        ssa[:, :, z0:z1, c] = a
        pfi[:, :, z0:z1, c] = p

    total = ext.sum(axis=-1)

    # --- stacked device tables ---
    tables = _build_device_tables(
        [comp.phase_function_table for comp in components],
        n_cdf_steps, n_forward_angles, compute_intensity_tables,
        hybrid_width_deg)

    # --- packed per-cell collision records (one gather per event) ---
    all_hg = all(p.hg_g is not None
                 for comp in components
                 for p in comp.phase_function_table.phase_functions)
    n_cells = nx * ny * nz

    if device_fields == "compact":
        # Separable-only domain: uniformity flags from the component
        # arrays directly (the packed records they normally come from are
        # skipped), then the sep detection and nothing else.
        occ = total > 0.0
        uniform_ssa = uniform_hg = False
        if ncomp == 1:
            sv = ssa[..., 0][occ] if occ.any() else ssa.flat[:1]
            gs = np.array(
                [pf.hg_g if pf.hg_g is not None else 0.0
                 for pf in components[0].phase_function_table.phase_functions],
                np.float32)
            gv = gs[pfi[..., 0][occ]] if occ.any() else gs[:1]
            uniform_ssa = bool(np.all(sv == sv.flat[0]))
            uniform_hg = bool(np.all(gv == gv.flat[0]))
        sep = _detect_separable(grid, components, ext, ssa, pfi, all_hg,
                                macro_factor, temps, False,
                                lambda_um=float(lambda_um))
        sep_atm = sep.pop("_sep_em_atm", 0.0)
        sep_amp_np = sep.pop("_sep_amp_np", None)
        if not sep["sep_template"]:
            raise ValueError(
                "build_domain(device_fields='compact') requires a "
                "separable domain (beta = a[col]*p[z] + q[z], one rank-1 "
                "scattering component plus at most one horizontally "
                "uniform pure absorber); this one is not -- rebuild with "
                "device_fields='full'")
        dom = OpticalDomain(
            grid=grid, total_ext=None, cum_ext=None, ssa=None,
            phase_index=None, cell_records=None, tables=tables,
            all_hg=all_hg, uniform_ssa=uniform_ssa, uniform_hg=uniform_hg,
            macro_factor=int(macro_factor), temps=None,
            lambda_um=float(lambda_um), ncomp_hint=ncomp, **sep)
        object.__setattr__(dom, "sep_em_atm", sep_atm)
        # host copy of sep_amp: the in-kernel group-rejection emission
        # sampler's Walker tables are built host-side (sequential Vose)
        # and must not fetch the device array under a jit trace
        object.__setattr__(dom, "_sep_amp_np", sep_amp_np)
        return dom

    cum = np.cumsum(ext, axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        cum_frac = np.where(
            total[..., None] > 0,
            cum / np.maximum(total[..., None], 1e-300), 1.0)
    cum_frac[..., -1] = 1.0

    # Local majorant field for two-level Woodcock: max extinction over each
    # cell's macro block. Requires a regular grid (the kernel computes
    # macro-box faces arithmetically); falls back to the global majorant.
    if macro_factor > 0 and not (grid.xy_regular and grid.z_regular):
        macro_factor = 0
    global_max = float(total.max()) if total.size else 0.0
    if macro_factor > 0:
        # vectorized block-max: pad to full macro blocks (zero padding
        # cannot raise a max over non-negative extinction), reduce, expand
        f = macro_factor
        nbx, nby, nbz = -(-nx // f), -(-ny // f), -(-nz // f)
        tp = np.zeros((nbx * f, nby * f, nbz * f), total.dtype)
        tp[:nx, :ny, :nz] = total
        bm = tp.reshape(nbx, f, nby, f, nbz, f).max(axis=(1, 3, 5))
        majorant = np.repeat(np.repeat(np.repeat(
            bm, f, 0), f, 1), f, 2)[:nx, :ny, :nz]
    else:
        majorant = np.full_like(total, global_max)

    rec = np.zeros((n_cells, 2 + 4 * ncomp), np.float32)
    rec[:, 0] = total.reshape(-1)
    rec[:, 1] = majorant.reshape(-1)
    rec[:, 2:2 + ncomp] = cum_frac.reshape(-1, ncomp)
    rec[:, 2 + ncomp:2 + 2 * ncomp] = ssa.reshape(-1, ncomp)
    rec[:, 2 + 2 * ncomp:2 + 3 * ncomp] = pfi.reshape(-1, ncomp)
    for c, comp in enumerate(components):
        gs = np.array([p.hg_g if p.hg_g is not None else 0.0
                       for p in comp.phase_function_table.phase_functions],
                      np.float32)
        rec[:, 2 + 3 * ncomp + c] = gs[pfi.reshape(-1, ncomp)[:, c]]

    # Uniformity detection over OCCUPIED cells only (empty cells never
    # scatter, so their ssa/g values are irrelevant to the kernels)
    occ = rec[:, 0] > 0.0
    ssa0 = rec[occ, 2 + ncomp] if occ.any() else rec[:1, 2 + ncomp]
    g0 = rec[occ, 2 + 3 * ncomp] if occ.any() else rec[:1, 2 + 3 * ncomp]
    uniform_ssa = ncomp == 1 and bool(np.all(ssa0 == ssa0[0]))
    uniform_hg = ncomp == 1 and bool(np.all(g0 == g0[0]))
    if uniform_ssa:
        # make unoccupied cells consistent so the scalar is exact
        rec[:, 2 + ncomp] = ssa0[0]
    if uniform_hg:
        rec[:, 2 + 3 * ncomp] = g0[0]

    # --- column-template detection (Landsat-style scenes) ---
    # beta(x,y,z) = col_scale * (iz < col_height) [+ col_qz(z)]: cloud
    # cells form a contiguous uniform block from z=0 in every column;
    # optionally plus ONE horizontally uniform pure-absorber gas
    # component (broadband-SW per-bin shape over a Landsat cloud).
    col_template = False
    col_scale = col_height = macro_table_flat = None
    col_gas = dict(col_qz=None, col_cloud=None, col_analytic_hg=True,
                   col_inv_row=0)
    cand_ext = None
    if grid.xy_regular and grid.z_regular:
        if ncomp == 1:
            # detect on the f32 field the kernel sees
            cand_ext = np.asarray(total, np.float32)
            gas_q, cloud_c = None, 0
        elif ncomp == 2:
            uni = [bool(np.all(ext[:, :, :, c] == ext[:1, :1, :, c]))
                   for c in range(2)]
            if uni[0] != uni[1]:
                gas_c, cloud_c = (0, 1) if uni[0] else (1, 0)
                occ_g = ext[:, :, :, gas_c] > 0
                gas_pure = (not occ_g.any()) or float(
                    np.abs(np.asarray(ssa)[:, :, :, gas_c][
                        np.asarray(occ_g)]).max()) == 0.0
                if gas_pure:
                    gas_q = np.asarray(ext[0, 0, :, gas_c], np.float32)
                    cand_ext = np.asarray(ext[:, :, :, cloud_c],
                                          np.float32)
    if cand_ext is not None:
        t2 = cand_ext.reshape(nx * ny, nz)
        h = (t2 > 0.0).sum(axis=1).astype(np.int64)
        iz_row = np.arange(nz)[None, :]
        if bool(np.all((t2 > 0.0) == (iz_row < h[:, None]))):
            scale = t2[np.arange(nx * ny), np.maximum(h - 1, 0)]
            scale = np.where(h > 0, scale, 0.0).astype(np.float32)
            tmpl = scale[:, None] * (iz_row < h[:, None])
            match = bool(np.all(t2 == tmpl))
            if match and gas_q is not None:
                # 2-comp acceptance: heights must VARY (uniform-height
                # slab + gas is the separable kernel's territory, which
                # also covers its LW emission) and the cloud must carry
                # ONE ssa and ONE phase entry over occupied cells.
                # NOTE: this mirrors _detect_separable's cloud/gas
                # component analysis (uniform split, pure-absorber gas,
                # ssa/phase uniformity, inv_row = offset + entry) --
                # keep the two in sync when touching either.
                occ_c = cand_ext > 0
                if not occ_c.any() or int(h.max()) == int(
                        h[h > 0].min() if (h > 0).any() else 0):
                    match = False
                else:
                    ssa_c_v = np.asarray(ssa)[:, :, :, cloud_c][occ_c]
                    pfi_c_v = np.asarray(pfi)[:, :, :, cloud_c][occ_c]
                    if (not bool(np.all(ssa_c_v == ssa_c_v.flat[0]))
                            or not bool(
                                np.all(pfi_c_v == pfi_c_v.flat[0]))):
                        match = False
                    else:
                        entry = int(pfi_c_v.flat[0])
                        tbl_c = components[cloud_c].phase_function_table
                        g_c = tbl_c.phase_functions[entry].hg_g
                        offset = sum(
                            components[c].phase_function_table.n_entries
                            for c in range(cloud_c))
                        col_gas = dict(
                            col_qz=jnp.asarray(gas_q, jnp.float32),
                            col_cloud=jnp.asarray(
                                [float(ssa_c_v.flat[0]),
                                 float(g_c) if g_c is not None else 0.0,
                                 float(gas_q.max())], jnp.float32),
                            col_analytic_hg=bool(g_c is not None),
                            col_inv_row=offset + entry)
            if match:
                col_template = True
                col_scale = jnp.asarray(scale, jnp.float32)
                col_height = jnp.asarray(h.astype(np.float32))
                if macro_factor > 0:
                    # xy-block majorant table for the column megakernel:
                    # per block, (max scale rounded UP to bf16 so the bound
                    # survives the bf16 table, max cloud-top height in
                    # cells). Blocks span the full z range; the kernel
                    # clips jumps at xy faces and the block's cloud-top
                    # plane instead of 3D macro cells.
                    f = macro_factor
                    nbx, nby = -(-nx // f), -(-ny // f)
                    s2 = np.zeros((nbx * f, nby * f), np.float32)
                    h2 = np.zeros((nbx * f, nby * f), np.float32)
                    s2[:nx, :ny] = scale.reshape(nx, ny)
                    h2[:nx, :ny] = h.reshape(nx, ny).astype(np.float32)
                    bs = s2.reshape(nbx, f, nby, f).max(axis=(1, 3))
                    bh = h2.reshape(nbx, f, nby, f).max(axis=(1, 3))
                    # round the majorant UP in bf16 (so the bound survives
                    # the kernel's bf16 table quantization)
                    import ml_dtypes
                    bs16 = bs.astype(ml_dtypes.bfloat16).astype(np.float32)
                    bumped = (bs * (1.0 + 2.0 ** -6)).astype(
                        ml_dtypes.bfloat16).astype(np.float32)
                    bump = np.where(bs16 < bs, bumped, bs16)
                    macro_table_flat = jnp.asarray(
                        np.stack([bump.reshape(-1), bh.reshape(-1)], 1),
                        jnp.float32)  # [nbx*nby, 2]

    # --- column-template BBEmission tables (LW Landsat-class scenes) ---
    col_em = dict(col_em_prob=None, col_em_alias=None, col_em_halias=None,
                  col_em_fcum=None)
    if (col_template and uniform_ssa and temps is not None
            and float(lambda_um) > 0.0):
        t = np.asarray(temps)
        if bool(np.all(t == t[0:1, 0:1, :])):
            from mcbrat3d_tpu.core.planck import planck_radiance
            from mcbrat3d_tpu.sources.illumination import _walker_alias
            tz = t[0, 0, :].astype(np.float64)
            b = np.where(tz > 0,
                         planck_radiance(float(lambda_um),
                                         np.maximum(tz, 1.0)), 0.0)
            fcum = np.cumsum(b)
            hi_ = np.asarray(h, np.int64)
            cb_h = np.where(hi_ > 0, fcum[np.maximum(hi_ - 1, 0)], 0.0)
            wcol = np.asarray(scale, np.float64) * cb_h
            ws = wcol.sum()
            if ws > 0:
                prob_c, alias_c = _walker_alias(wcol / ws)
                al_i = np.asarray(alias_c, np.int64)
                col_em = dict(
                    col_em_prob=jnp.asarray(prob_c, jnp.float32),
                    col_em_alias=jnp.asarray(alias_c, jnp.float32),
                    col_em_halias=jnp.asarray(
                        hi_[al_i].astype(np.float32)),
                    col_em_fcum=jnp.asarray(fcum, jnp.float32))

    # --- separable-template detection (flagship LW scenes) ---
    # beta = a[x,y] * p[z] + q[z]: one rank-1 "cloud" component plus at
    # most one horizontally uniform component with ssa == 0. See the
    # OpticalDomain.sep_* field docs; kernel: transport/pallas_sep.py.
    sep = _detect_separable(grid, components, ext, ssa, pfi, all_hg,
                            macro_factor, temps, col_template,
                            lambda_um=float(lambda_um))
    sep_atm = sep.pop("_sep_em_atm", 0.0)
    sep_amp_np = sep.pop("_sep_amp_np", None)

    dom = OpticalDomain(
        grid=grid,
        total_ext=jnp.asarray(total, jnp.float32),
        **sep,
        cum_ext=jnp.asarray(cum_frac, jnp.float32),
        ssa=jnp.asarray(ssa, jnp.float32),
        phase_index=jnp.asarray(pfi),
        cell_records=jnp.asarray(rec),
        tables=tables,
        all_hg=all_hg,
        uniform_ssa=uniform_ssa,
        uniform_hg=uniform_hg,
        macro_factor=int(macro_factor),
        temps=None if temps is None else jnp.asarray(temps, jnp.float32),
        lambda_um=float(lambda_um),
        col_scale=col_scale,
        col_height=col_height,
        macro_table=macro_table_flat,
        col_template=col_template,
        **col_em,
        **col_gas,
    )
    # Host-side scalar for illumination.emission_separable (NOT a pytree
    # leaf: per-bin values must not retrigger jit, and only host setup
    # code reads it).
    object.__setattr__(dom, "sep_em_atm", sep_atm)
    object.__setattr__(dom, "_sep_amp_np", sep_amp_np)
    return dom
