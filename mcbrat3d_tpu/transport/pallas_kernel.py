"""VMEM-resident Pallas transport megakernel (the TPU fast path).

TPU-first re-implementation of the integrator hot loop (reference:
Integrators/monteCarloRadiativeTransfer.f95:393-841, computeRT) as a single
Mosaic kernel that keeps photon state, the cell-record table, and the tally
buffer entirely in VMEM across K transport steps per launch:

  * photon state is [R, 128] lane-major float32 (R rows of 128 lanes);
  * cell-record gathers run on the MXU: a (hi, lo) factorized one-hot
    (cell = hi * 128 + lo) built as [BLK, 128, 128] compares against a
    hoisted iota, contracted by *batched* matmuls so results stay in the
    block layout (no cross-lane transposes);
  * tallies accumulate by the transposed contraction of the same one-hots;
    the volume-absorption section of the tally buffer is placed at a
    128-aligned base so the collision gather's lo-one-hot is reused;
  * one-hots are exact in bf16, so both MXU contractions run at bf16 rate
    with hi/lo *value splits* (v = bf16(v) + bf16(v - bf16(v)), ~2^-17
    relative -- far below MC noise) on the record table and tally values;
    PallasConfig(bf16=False) selects the exact all-f32 pipeline;
  * uniforms come from the hardware PRNG (pltpu.prng_random_bits, seeded
    per (seed, step, block)) on TPU; the CPU interpreter uses a
    counter-based murmur3 mixer keyed by (lane, step, draw-site, seed).
    Both are stateless and reproducible in (key, call sequence);
  * one launch advances K steps inside a fori_loop; an XLA-level
    while_loop re-launches until every lane quota is spent and dead,
    with the ~2.6 MB state as the loop carry (HBM round-trip per launch
    is amortized over K steps).

Eligibility (everything else falls back to transport.integrator):
monochromatic runs with up to 3 components (gas + cloud + Rayleigh --
the production broadband shape; multi-component collisions use the
scattering-coefficient formulation, see _build_kernel) on a regular grid;
uniform Lambertian, uniform RPV, or per-pixel Lambertian surfaces;
directional/random-azimuth/flux/spotlight sources plus BBEmission in
lw_mode; and n_cells within the VMEM record-table envelope (MAX_CELLS).
Radiance runs cover the PRODUCTION-DEFAULT estimator -- Iwabuchi Russian
roulette (post-march decisions), hybrid/tabulated forward phase tables,
limitIntensityContributions capping -- for up to MAX_KERNEL_DIRS (64)
directions per pass (bigger grids run chunked) with mu >= pallas_min_mu
(pallas_intensity_eligible + dirs_mu_floor_ok). Bigger column-template
domains: transport/pallas_col.py; separable-template domains:
transport/pallas_sep.py.
"""

from __future__ import annotations

import collections
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination

_TINY = np.float32(1e-30)
_TOP_EPS = np.float32(1e-6)
_BIG_F = np.float32(3e38)

# Record columns gathered per collision: total extinction, single-scattering
# albedo, HG asymmetry, (pad). Padded to 4 so W = H * REC_COLS stays
# lane-tileable for every H.
REC_COLS = 4

# The (hi, lo) factorization needs hi < W/REC_COLS table blocks; the
# sublane machinery has no hard 128 limit on hi, so the envelope is set
# by gather width (w_cols = ceil(cells/128)*REC_COLS) and tally rows.
# 36864 cells (288 hi blocks) covers the I3RC radar cloud (640 x 54;
# reference: Domain-Files/i3rcRadarCloud.f95:28-30); beyond ~16384 cells
# the launcher shrinks block_rows to bound the gather's VMEM transient.
MAX_CELLS = 288 * 128

# Components handled in-kernel: the record gather carries the effective
# single-scattering albedo + cumulative scattering fractions + per-component
# phase field, and the collision selects the scattering component with
# <= MAX_COMPONENTS - 1 compares against one uniform (the reference's
# bisection degenerates to this at small ncomp; reference:
# Integrators/monteCarloRadiativeTransfer.f95:759-760). Covers the
# production broadband shape: gas absorption + cloud particles + Rayleigh.
MAX_COMPONENTS = 3

# The inverse-CDF angle table uses the cheaper march-style single-pair
# gather ([3*hp, 128] rows), so its envelope is larger than the record
# table's: 131072 entries covers the reference-default 9001-step tables
# with ~14 Reff entries (reference nPhaseIntervals default:
# Drivers/monteCarloDriver.f95 namelist monteCarlo).
MAX_INV_ENTRIES = 1024 * 128

# Per-pixel Lambertian surface budget: the albedo grid is packed per
# DOMAIN COLUMN ([SURF_PX_MAX_ROWS, 128] f32 rows) and fetched at the
# landing column with per-lane dynamic gathers (one take_along_axis +
# select per row), so the cap bounds the per-step select chain.
SURF_PX_MAX_ROWS = 32


def surface_px_ok(surface: "Surface", grid, lw_mode: bool,
                  max_cols: int = 128 * SURF_PX_MAX_ROWS) -> bool:
    """Megakernel eligibility of a per-pixel Lambertian surface.

    Exactness contract: each surface pixel must tile a whole number of
    domain columns (nx % nxs == 0, ny % nys == 0), so the per-column
    packed albedo reproduces the reference's fractional surface-grid
    lookup (src/surfaceProperties.f95:119-147) bit-for-bit. lw_mode is
    excluded (surface BBEmission uses the uniform-albedo pre-credit).
    ``max_cols`` bounds the kernel-specific fetch budget: the record
    kernel's per-row select chain caps at 128 * SURF_PX_MAX_ROWS; the
    column kernel's one-hot MXU gather covers its full column envelope
    (it passes its own MAX_COLS).
    """
    if lw_mode or not surface.is_lambertian_grid:
        return False
    if surface.is_uniform_lambertian:
        return False  # the scalar fast path covers it (no gather)
    nxs, nys, _ = surface.params.shape
    nx, ny, _ = grid.shape
    return (nx % nxs == 0 and ny % nys == 0 and nx * ny <= max_cols)


@dataclasses.dataclass(frozen=True)
class PallasConfig:
    """Static launch geometry for the megakernel."""

    rows: int = 512          # state rows: n_lanes = rows * 128
    block_rows: int = 32     # rows per one-hot/matmul block
    steps_per_call: int = 128
    max_steps: int = 20_000
    interpret: bool = False  # CPU interpreter mode (tests)
    # bf16 one-hot pipeline: one-hots are exact in bf16; the record table
    # and tally values carry hi/lo bf16 splits (~2^-17 relative error,
    # far below MC noise) so both MXU contractions run at bf16 rate and
    # one-hot VMEM traffic halves. False = exact all-f32 pipeline.
    bf16: bool = True
    # Local-estimation radiance: number of intensity directions (0 = off)
    # and the static DDA-march iteration bound per direction. When on,
    # every scattering/surface event runs an in-kernel DDA march to the
    # domain top per direction (one-hot gathers per crossing) and tallies
    # w * P/(4 pi |mu_d|) * exp(-tau) at the TOA exit column
    # (reference: Integrators/monteCarloRadiativeTransfer.f95:1623-1832).
    n_dirs: int = 0
    k_dda: int = 0
    # Iwabuchi-2006 Russian-roulette estimator: the in-kernel march is a
    # fixed-bound fori (no early-exit win), so the RR branches are applied
    # POST-march from the full optical depth -- statistically identical to
    # the reference's early-stopped marches (escape <=> tau_toa below the
    # branch cap; reference:
    # Integrators/monteCarloRadiativeTransfer.f95:1753-1813).
    intensity_rr: bool = False
    zeta_min: float = 0.3
    # Phase values for local estimation: "analytic" (HG closed form),
    # "hybrid" (Gaussian-peak forward table) or "orig" (tabulated
    # non-hybrid values; required for non-HG domains).
    intensity_phase: str = "analytic"
    # limitIntensityContributions: cap each local-estimate contribution
    # at max_contribution, accumulate the clipped excess per (direction,
    # component slot) and per-slot images in-kernel, and redistribute the
    # excess across the image post-launch (reference:
    # Integrators/monteCarloRadiativeTransfer.f95:294-322,1815-1826).
    intensity_limit: bool = False
    max_contribution: float = 77.0
    # need_volume_absorption=False fast path: tally absorbed flux into a
    # per-COLUMN section instead of the [nxyz] volume rows. The tally's
    # elementwise cost scales with the accumulator height (~208 rows on
    # the 32x32x24 step cloud, ~24 with this flag), the largest
    # single-lever step-cost cut identified in round 3's 1e8 ceiling
    # analysis. Matches the reference's optional-output contract
    # (reportVolumeAbsorption/reportAbsProf both off ->
    # Drivers/monteCarloDriver.f95:1324 output skipped).
    flux_abs_2d: bool = False
    # Dynamic-gather record fetch: per-lane take_along_axis rows
    # (tpu.dynamic_gather) replace the one-hot MXU record gather for
    # SMALL tables -- measured 4x cheaper at the step cloud's 8-row
    # table (tools/probe_gather2.py, EXPERIMENTS_1e8.md round 4), and
    # exact (the f32 rows are gathered directly, no bf16 split).
    # Resolved automatically in run_batch_pallas (field count x table
    # rows <= _DYN_GATHER_MAX_OPS); "nodyn" in debug_parts disables.
    dyn_gather: bool = False
    # Same primitive for the radiance CELL march's per-crossing beta
    # fetch: the march table ships as exact f32 rows (no bf16 split)
    # and each crossing does h_cells take_along_axis + select instead
    # of the per-blk-row MXU dot. Auto-resolved alongside dyn_gather;
    # the colct march keeps the one-hot (its 4-point interpolation
    # needs the whole column block).
    dyn_march: bool = False
    # Early-exit radiance march: lax.while_loop over crossings (stops when
    # every lane in the block finished) instead of a fixed k_dda fori.
    # Identical results; expected 2-4x on march cost (most marches finish
    # far below the worst-case bound). Off by default until the Mosaic
    # compile path is validated on hardware (round-1 saw while_loop
    # compile hangs; see PERF_NOTES "Relay hazard").
    march_while: bool = False
    # Radiance march formulation (global fallback; see march_dirs):
    #   "colct": per-COLUMN cumulative-optical-depth tables. Within one
    #     column, integral(beta dl) over a slant segment is exactly
    #     (CT(z_in) - CT(z_out)) / mu with CT the piecewise-linear
    #     cumulative vertical optical depth to TOA, so the march needs
    #     ONE one-hot gather per horizontal (column) crossing instead of
    #     one per cell face -- z-crossings cost nothing. Fewer, but
    #     individually costlier, iterations (taller table + the 4-row
    #     interpolation-weight reduce).
    #   "cell" (default): per-cell-face DDA with a beta gather per
    #     crossing (reference-shaped; cheap per iteration).
    march_mode: str = "cell"
    # per-direction march formulation ("cell"/"colct", unrolled
    # n_dirs <= 6 path): steep directions cross few columns and want
    # colct; shallow ones want cell. Chosen host-side by the crossing
    # x cost model in run_batch_pallas_tallies. Empty = march_mode.
    march_dirs: tuple = ()
    # per-direction static march bounds (unrolled n_dirs <= 6 path): a
    # nadir direction crosses ~1 column while the shallowest crosses
    # dozens, so bounding each direction separately cuts total march
    # iterations several-fold. Empty = use k_dda for every direction.
    k_dda_dirs: tuple = ()
    # > 6 directions (fori path): (mode, k_bound, start, count) groups
    # over the PERMUTED direction order (dir_perm); each group gets its
    # own fori with a static bound + formulation, so shallow directions
    # don't impose their march length on steep ones. Empty = one fori
    # over all directions at k_dda.
    dir_groups: tuple = ()
    dir_perm: tuple = ()
    # perf-bisection knob: comma-set of enabled sections out of
    # {gather, tally, exits}; anything disabled is replaced by constants.
    # NOT for production use -- statistics are wrong unless "all".
    debug_parts: str = "all"

    @property
    def n_lanes(self) -> int:
        return self.rows * 128


# take_along_axis (tpu.dynamic_gather) budget for the record fetch:
# gathered fields x table rows. Round-5 row-scaling measurement
# (tools/exp_tile1.py part A, production kernel on dense broken-cloud
# scenes, v5e): the select chain is near-FLAT in table rows -- 2.78 G
# lane-steps/s at 8 rows, 2.14 G at 32, 2.44 G at 128 (2 fields each),
# while the one-hot MXU gather at 128 rows measured 0.17 G (14x slower;
# its MAC cost is Theta(cells)/lane). The old budget of 32 (set by the
# small-table crossover in tools/probe_gather2.py) left every mid-size
# dense domain on the one-hot cliff: dense 32x16x32 measured 0.405 M
# photons/s one-hot vs 3.19 M dyn-gather. 256 covers 2 fields x 128
# rows = the full record envelope's row range.
_DYN_GATHER_MAX_OPS = 256

# The radiance CELL march gathers once per crossing per direction (not
# once per step), so its dyn-vs-onehot economics were only measured in
# the small-row regime; keep the march on the original conservative
# budget until the tall-table march is measured.
_DYN_MARCH_MAX_ROWS = 32


def _dyn_gather_fields(n_comp: int, uniform_ssa: bool, uniform_hg: bool,
                       macro_factor: int) -> int:
    """Record fields the gather extracts (mirrors _build_kernel's
    gather_fields)."""
    if n_comp == 1:
        return (1 + (0 if uniform_ssa else 1) + (0 if uniform_hg else 1)
                + (1 if macro_factor > 0 else 0))
    return (1 + (1 if macro_factor > 0 else 0) + 4
            + (2 if n_comp == 3 else 0))


# In-kernel radiance direction cap per LAUNCH: the per-direction Iwabuchi
# RR murmur sites are 16 + 2d (d < (_N_SITES - 16) // 2) and the radiance
# accumulator carries n_dirs * hti_pad VMEM rows. Larger direction grids
# (the reference's go to 648, Drivers/monteCarloDriver.f95:61) run as
# multiple chunked transport passes over the same photon paths
# (integrator.run_batch splits them; tests may lower this to exercise the
# chunking cheaply).
MAX_KERNEL_DIRS = 64


def dirs_mu_floor_ok(icfg, dirs) -> bool:
    """Host-side validation of the in-kernel local-estimation mu floor.

    The megakernel's DDA march bound (k_dda) is sized from
    icfg.pallas_min_mu; a direction with 0 < mu < pallas_min_mu would get a
    truncated march whose contribution is silently dropped. This check MUST
    run on concrete (untraced) direction values -- call it before entering
    jit and thread the result in as a static argument. Traced dirs return
    False (refuse the in-kernel path; the XLA estimator handles any mu).
    """
    if icfg is None or dirs is None or isinstance(dirs, jax.core.Tracer):
        return False
    d = np.asarray(dirs)
    return bool(np.all(d[2] >= max(icfg.pallas_min_mu, 1e-6)))


def pallas_intensity_eligible(domain: OpticalDomain, surface: Surface,
                              source: illumination.Source,
                              lw_mode: bool,
                              record_scattering_orders: int,
                              use_ray_tracing: bool,
                              icfg, dirs,
                              dirs_mu_ok: bool = False) -> bool:
    """True when the megakernel's in-kernel local estimation covers this
    radiance configuration: the production-default estimator INCLUDING
    Iwabuchi Russian roulette (post-march decisions, round 3), hybrid /
    tabulated forward phase tables (resampled uniform in sin(theta/2)),
    and limitIntensityContributions capping with excess redistribution
    (round 4); every direction's mu >= icfg.pallas_min_mu (validated
    host-side via dirs_mu_floor_ok and passed in as the static
    ``dirs_mu_ok``), on a flux-eligible domain. Direction counts above
    MAX_KERNEL_DIRS run as chunked transport passes (integrator)."""
    if icfg is None or dirs is None:
        return False
    return not intensity_ineligibility_reasons(
        domain, surface, source, lw_mode, record_scattering_orders,
        use_ray_tracing, icfg, dirs, dirs_mu_ok)


def intensity_ineligibility_reasons(domain, surface, source, lw_mode,
                                    record_scattering_orders,
                                    use_ray_tracing, icfg, dirs,
                                    dirs_mu_ok: bool) -> list:
    """Names of every failing in-kernel local-estimation predicate
    (empty = eligible). Used to build actionable forced-megakernel errors."""
    reasons = ineligibility_reasons(
        domain, surface, source, lw_mode, compute_intensity=False,
        record_scattering_orders=record_scattering_orders,
        use_ray_tracing=use_ray_tracing)
    fwd = domain.tables.forward
    hyb_ok = (not icfg.use_hybrid_phase) or (
        fwd.shape[1] > 1 and (not domain.all_hg or fwd.shape[0] == 1))
    checks = (
        ("intensity needs phase values: an all-HG domain or computed "
         "forward tables (build_domain(compute_intensity_tables=True))",
         domain.all_hg or domain.tables.forward_orig.shape[1] > 1),

        ("use_hybrid_phase=True without usable forward tables (need "
         "compute_intensity_tables=True and, for all-HG domains, a single "
         "shared table row)", hyb_ok),
        ("n_orders_orig_phase > 0", icfg.n_orders_orig_phase == 0),
        (f"n_dirs={icfg.n_dirs} > {MAX_KERNEL_DIRS}",
         icfg.n_dirs <= MAX_KERNEL_DIRS),
        ("intensity_dirs is None" if dirs is None else
         f"dirs shape {tuple(dirs.shape)} != (3, {icfg.n_dirs})",
         dirs is not None and tuple(dirs.shape) == (3, icfg.n_dirs)),
        ("a direction's mu is below icfg.pallas_min_mu (or dirs were "
         "traced; validate with concrete directions before jit)",
         dirs_mu_ok),
        # the in-kernel surface local-estimate term is Lambertian 1/pi
        # (reference: Integrators/monteCarloRadiativeTransfer.f95:1688-1694)
        # -- albedo-independent, so the per-pixel Lambertian grid (whose
        # albedo is already folded into w_refl at the reflection) is as
        # exact as the uniform case
        ("intensity with a non-Lambertian surface",
         surface.is_uniform_lambertian
         or surface_px_ok(surface, domain.grid, lw_mode)),
    )
    reasons.extend(name for name, ok in checks if not ok)
    return reasons


def pallas_eligible(domain: OpticalDomain, surface: Surface,
                    source: illumination.Source,
                    lw_mode: bool, compute_intensity: bool,
                    record_scattering_orders: int,
                    use_ray_tracing: bool) -> bool:
    """True when the record megakernel covers this configuration exactly."""
    return not ineligibility_reasons(
        domain, surface, source, lw_mode, compute_intensity,
        record_scattering_orders, use_ray_tracing)


def ineligibility_reasons(domain: OpticalDomain, surface: Surface,
                          source: illumination.Source,
                          lw_mode: bool, compute_intensity: bool,
                          record_scattering_orders: int,
                          use_ray_tracing: bool) -> list:
    """Names of every failing record-megakernel predicate (empty = eligible).

    Eligibility: monochromatic runs with up to MAX_COMPONENTS components on
    a regular grid; uniform Lambertian, uniform RPV, or per-pixel
    Lambertian (surface_px_ok) surfaces; directional/random-azimuth/flux/
    spotlight sources plus BBEmission in lw_mode; n_cells small enough
    for the VMEM record table. Radiance runs additionally gate through
    pallas_intensity_eligible; bigger column-template domains through
    transport/pallas_col.py; separable-template domains through
    transport/pallas_sep.py."""
    nx, ny, nz = domain.grid.shape
    n_cells = nx * ny * nz
    vol_base = -(-2 * nx * ny // 128) * 128
    checks = (
        (f"inverse-CDF table has {domain.tables.inverse.size} entries > "
         f"{MAX_INV_ENTRIES}",
         domain.all_hg or domain.tables.inverse.size <= MAX_INV_ENTRIES),
        (f"n_components={domain.n_components} > {MAX_COMPONENTS}",
         domain.n_components <= MAX_COMPONENTS),
        ("irregular grid spacing",
         domain.grid.xy_regular and domain.grid.z_regular),
        ("non-uniform or unsupported-BRDF surface (in-kernel: uniform "
         "Lambertian, uniform RPV, or a per-pixel Lambertian grid that "
         f"divides the domain columns, <= {128 * SURF_PX_MAX_ROWS} "
         "columns, not lw_mode)",
         surface.is_uniform_lambertian or surface.is_uniform_rpv
         or surface_px_ok(surface, domain.grid, lw_mode)),
        (f"source kind {source.kind!r} not in-kernel",
         source.kind in (illumination.DIRECTIONAL,
                         illumination.RANDOM_AZIMUTH,
                         illumination.FLUX,
                         illumination.SPOTLIGHT)
         or (source.kind == illumination.EMISSION
             and source.em_prob is not None)),
        ("lw_mode without an emission source",
         (not lw_mode) or source.kind == illumination.EMISSION),
        ("compute_intensity outside pallas_intensity_eligible",
         not compute_intensity),
        ("record_scattering_orders > 0", record_scattering_orders == 0),
        ("use_ray_tracing=True (megakernel is max-cross-section only)",
         not use_ray_tracing),
        (f"n_cells={n_cells} > {MAX_CELLS}", n_cells <= MAX_CELLS),
        (f"tally span {vol_base + n_cells} > {MAX_CELLS}",
         vol_base + n_cells <= MAX_CELLS),
    )
    return [name for name, ok in checks if not ok]


# ---------------------------------------------------------------------------
# In-kernel counter-based RNG: murmur3 finalizer rounds over
# (lane, step * n_sites + site, seed). Bijective mixing with full avalanche;
# replaces the XLA kernel's threefry streams (statistically equivalent
# sampling; reference RNG contract: src/RandomNumbersForMC.f95).
# ---------------------------------------------------------------------------

def _fmix32(x):
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EB_CA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2_AE35)
    x = x ^ (x >> 16)
    return x


# Draw sites per step. Sites 16+2d..17+2d serve per-direction Iwabuchi RR;
# with n_dirs up to 64 the largest site is 16 + 2*63 + 1 = 143, so 256
# keeps (ctr, site) streams collision-free (at 64 sites, direction >= 24
# aliased the next step's transport draws on the software-RNG path --
# the round-3 advisor find).
_N_SITES = 256


def _make_uniform(lane_u32, seed_u32, mode: str = "murmur", ctr_f32=None):
    """Returns u(step_counter, site) -> f32 uniforms in [0, 1).

    mode: "murmur" (production), "cheap" (perf bisection: a few f32 ops,
    NOT statistically sound; ctr_f32 is the f32 step counter).
    """

    if mode == "cheap":
        lane_f = jax.lax.bitcast_convert_type(
            lane_u32 >> np.uint32(8), jnp.int32).astype(jnp.float32)

        def u_cheap(counter, site):
            del counter  # step variation comes from ctr_f32 (closure)
            v = (lane_f * np.float32(0.61803)
                 + ctr_f32 * np.float32(0.7548777)
                 + np.float32(site) * np.float32(0.3247))
            return v - jnp.floor(v)

        return u_cheap

    def u(counter, site):
        # site may be a traced int32 (direction-fori local estimation)
        site_u = (np.uint32(site) if isinstance(site, int)
                  else site.astype(jnp.uint32))
        c = (counter * np.uint32(_N_SITES)
             + site_u) * np.uint32(0x9E37_79B9)
        x = _fmix32(lane_u32 ^ c)
        x = _fmix32(x ^ seed_u32 ^ (c * np.uint32(0x8564_9F3D)))
        # Mosaic lacks a uint32 -> f32 cast; after >> 8 the value fits in
        # 24 bits, so a bitcast to int32 is value-preserving.
        x24 = jax.lax.bitcast_convert_type(x >> np.uint32(8), jnp.int32)
        return x24.astype(jnp.float32) * np.float32(2.0 ** -24)

    return u


# ---------------------------------------------------------------------------
# Factorized one-hot helpers (all stay in [BLK, 128, *] block layout)
# ---------------------------------------------------------------------------

def _bf16_split(v):
    """f32 -> (bf16 high, bf16 low) with v ~= high + low exactly in f32."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _onehot_lo(idx_blk, iota_lane, dtype=jnp.float32):
    """[BLK, 128] int32 -> [BLK, 128, 128] one-hot of idx & 127.

    One-hots are exactly representable in bf16, which halves the VMEM
    traffic of the materialized tensor and feeds the MXU at bf16 rate.
    """
    lo = jnp.bitwise_and(idx_blk, 127)
    return (lo[:, :, None] == iota_lane).astype(dtype)


def _gather_records(cell_blk, oh_lo, tables, iota_w_div, iota_w_mod,
                    fields=(0, 1, 2)):
    """One factorized record gather for a [BLK, 128] block of lanes.

    ``tables`` is (B_hi, B_lo): either (f32 table, None) for the exact-f32
    pipeline, or a bf16 hi/lo split pair (B = hi + lo to ~2^-17 relative)
    contracted by two bf16 MXU matmuls accumulated in f32.

    The lo contraction is a 2D MXU matmul over merged lane rows (3D
    contractions and batched dots lower ~10x slower in Mosaic); hi
    selection and per-record extraction are masked cross-lane reductions
    in block layout (lane-dim slice extraction costs ~10 us/block in
    Mosaic relayouts, 5x the whole gather). Each extracted record costs a
    reduction pass, so ``fields`` lists only the record columns the caller
    actually needs (uniform ssa/g domains extract just extinction).

    Returns a dict {record column -> [BLK, 128] f32}.
    """
    blk = cell_blk.shape[0]
    b_hi, b_lo = tables
    w_cols = b_hi.shape[1]
    # T[n, w] = B[lo(n), w]
    oh2 = oh_lo.reshape(blk * 128, 128)
    t2 = jnp.dot(oh2, b_hi, preferred_element_type=jnp.float32)
    if b_lo is not None:
        t2 = t2 + jnp.dot(oh2, b_lo, preferred_element_type=jnp.float32)
    t = t2.reshape(blk, 128, w_cols)
    # hi selection: keep only the w-block of this lane's hi index
    hi = jnp.right_shift(cell_blk, 7)
    s = t * (iota_w_div == hi[:, :, None]).astype(jnp.float32)
    # record extraction: masked sums over the (small) w lane dim
    return {r: jnp.sum(s * (iota_w_mod == r), axis=2) for r in fields}


def _hif_gather2(tab_ref, hp_t, hi_idx, lo_idx, blk):
    """Hi-first factorized gather of two stacked f32 table fields.

    ``tab_ref`` is [256, hp_t] f32: sublanes [0:128] hold field A
    TRANSPOSED (tab[l, h] = A[h*128 + l]) and [128:256] field B, for flat
    entry index i = h*128 + l. Per block row, the hi one-hot lives in
    SUBLANES ([hp_t, 128] iota-compare against the lane-resident hi -- no
    transpose), one [256, hp_t] @ [hp_t, 128] MXU dot pulls BOTH fields'
    full lo-columns for each lane's hi row, and a [128, 128] sublane
    masked reduce extracts lo. Exact f32 (a one-hot contraction selects
    single entries; no bf16 hi/lo split needed).

    This replaces the lo-first orientation (contract lo by per-row
    [n_fields*hp, 128] @ [128, 128] dots, then full-height hi masked
    reduces) whose [blk, n_fields*hp, 128] f32 intermediate dominates at
    big tables: at the reference-default 9001x5 inverse-CDF table
    (hp = 352) that stack is ~8.6 MB/step written + re-read by three
    full-height reduces, ~20x this form's traffic at equal MACs.

    Returns (A_vals, B_vals), each [blk, 128] f32.
    """
    a_rows, b_rows = [], []
    for bb in range(blk):
        ohhi = (jax.lax.broadcasted_iota(jnp.int32, (hp_t, 128), 0)
                == hi_idx[bb][None, :]).astype(jnp.float32)
        t2 = jnp.dot(tab_ref[:], ohhi, preferred_element_type=jnp.float32)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                == lo_idx[bb][None, :]).astype(jnp.float32)
        a_rows.append(jnp.sum(t2[:128] * mask, axis=0))
        b_rows.append(jnp.sum(t2[128:] * mask, axis=0))
    return jnp.stack(a_rows, axis=0), jnp.stack(b_rows, axis=0)


def _hif_gather2w(tab_ref, hp_t, hi_idx, lo_idx, blk):
    """Wide (all-block-rows-at-once) hi-first gather of a table pair.

    Same [256, hp_t] f32 layout as _hif_gather2, but ONE
    [256, hp_t] @ [hp_t, blk*128] dot serves every block row: the
    per-row form re-reads the whole table from VMEM per dot (16 reads of
    ~360 KB/step-slab at the 9001x5 inverse table, hp = 352), which
    dominates over the MACs; the wide form reads it once at identical
    MACs. The [256, blk*128] f32 output (2 MB at blk = 16) is reduced by
    one wide lo mask. Exact f32.
    Returns (A_vals, B_vals), each [blk, 128] f32.
    """
    w = blk * 128
    hi_w = hi_idx.reshape(1, w)
    lo_w = lo_idx.reshape(1, w)
    ohhi = (jax.lax.broadcasted_iota(jnp.int32, (hp_t, w), 0)
            == hi_w).astype(jnp.float32)
    t2 = jnp.dot(tab_ref[:], ohhi, preferred_element_type=jnp.float32)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (128, w), 0)
            == lo_w).astype(jnp.float32)
    a = jnp.sum(t2[:128] * mask, axis=0).reshape(blk, 128)
    b = jnp.sum(t2[128:] * mask, axis=0).reshape(blk, 128)
    return a, b


def _hif_gather2b(tab_ref, hp_t, hi_idx, lo_idx, blk):
    """bf16-split hi-first gather of a (value, delta) table pair.

    Same orientation as _hif_gather2, but the table is [384, hp_t] bf16:
    sublanes [0:128] field A's bf16 TRANSPOSED high part, [128:256] its
    bf16 residual (the split reconstructs A to ~2^-24 relative -- the
    round-3 lo-first production accuracy), [256:384] field B as a single
    bf16 (the lerp delta, whose bf16 relative error scales with the
    already-small step). The f32 [256, hp] form's dot runs at the MXU's
    f32 rate; this trades 1.5x the MACs for the bf16 rate (the dot is
    the dominant per-step cost at the reference-default 9001x5 inverse
    table, hp = 352). One-hot operands are exact in bf16.
    Returns (A_vals, B_vals), each [blk, 128] f32.
    """
    a_rows, b_rows = [], []
    for bb in range(blk):
        ohhi = (jax.lax.broadcasted_iota(jnp.int32, (hp_t, 128), 0)
                == hi_idx[bb][None, :]).astype(jnp.bfloat16)
        t2 = jnp.dot(tab_ref[:], ohhi, preferred_element_type=jnp.float32)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                == lo_idx[bb][None, :]).astype(jnp.float32)
        # fold the hi/lo split BEFORE the mask: one reduce instead of two
        a_rows.append(jnp.sum((t2[:128] + t2[128:256]) * mask, axis=0))
        b_rows.append(jnp.sum(t2[256:384] * mask, axis=0))
    return jnp.stack(a_rows, axis=0), jnp.stack(b_rows, axis=0)


def _tally_contract(oh_lo, t_hi_blk, val_blk, jmod, bf16: bool,
                    ht: int = 128):
    """Transposed factorized scatter-add for one block.

    acc[j, lo] += sum_{b,l} (t_hi(b,l) == j % ht) * val(b,l) * oh_lo[b,l,lo]

    The hi one-hot is TILED to the full 128 lanes via j % ht (``jmod`` is
    the host-precomputed [1, 128] table), so the MXU contraction is a full
    [nb,128] x [nb,128] -> [128,128] dot -- a skinny ht-wide operand would
    idle most of the systolic array AND pay lane-padding passes on every
    elementwise op. Rows j >= ht are duplicates the caller ignores.

    bf16 mode splits the values hi/lo (v = bf16(v) + bf16(v - bf16(v)),
    ~2^-17 relative) and runs two bf16 dots instead of one f32 dot; the
    f32 dot is the single most expensive op in the kernel (~1 GMAC/step
    contracted at f32 rate).
    """
    blk = val_blk.shape[0]
    nb = blk * 128
    o2 = oh_lo.reshape(nb, 128)
    if bf16:
        ht_pad = -(-ht // 8) * 8
        vh, vl = _bf16_split(val_blk)
        zero = jnp.bfloat16(0)
        # j-major layout: Mosaic rejects minor-dim insertion on 16-bit
        # operands (vh[:, :, None]), so broadcast the values along a MAJOR
        # j axis. j is a SUBLANE dim here, so it needs no 128-tiling --
        # [2*ht_pad, nb] @ [nb, 128] streams ~2*ht_pad/128 of the
        # full-tile MXU time (ht is 9 for the step cloud). The value
        # hi/lo splits are STACKED along j into ONE dot (rows [0:ht) get
        # vh, [ht:2ht) vl) so the one-hot operand streams through the
        # MXU once instead of twice; summing the two row-blocks in f32
        # is bitwise-identical to the previous two-dot accumulate.
        iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (2 * ht_pad, 1, 1),
                                           0)
        # fold j to j % ht_pad with ONE compare (no device mod, no i1 OR
        # -- boolean ops on masks are a known Mosaic hardware hazard,
        # see PERF_NOTES round 4): j_fold = j - ht_pad*(j >= ht_pad)
        j_fold = iota_j2 - np.int32(ht_pad) * (
            iota_j2 >= ht_pad).astype(jnp.int32)
        ohh_j2 = j_fold == t_hi_blk[None, :, :]
        vstk = jnp.where(iota_j2 < ht_pad, vh[None, :, :], vl[None, :, :])
        a2 = jnp.where(ohh_j2, vstk, zero).reshape(2 * ht_pad, nb)
        t2 = jnp.dot(a2, o2, preferred_element_type=jnp.float32)
        return t2[:ht_pad] + t2[ht_pad:]
    ohh = t_hi_blk[:, :, None] == jmod.reshape(1, 1, 128)
    a = jnp.where(ohh, val_blk[:, :, None], 0.0).reshape(nb, 128)
    dn = (((0,), (0,)), ((), ()))  # contract the lane rows
    return jax.lax.dot_general(a, o2, dn,
                               preferred_element_type=jnp.float32)


def _tally_contract_sub(ohs_sub, t_hi_blk, val_blk, ht: int):
    """Sublane-oriented factorized scatter-add for one block.

    acc[j, lo] += sum_{b,p} (t_hi(b,p) == j % ht) * val(b,p)
                            * ohs_sub[b, lo, p]

    Same math as _tally_contract, but the photon index stays in the LANE
    dim end-to-end: ``ohs_sub`` is the [blk, 128lo(sublane), p(lane)]
    one-hot (cheap to build -- no photon-lane -> sublane transpose) and
    the contraction is per-sublane-row dots over the photon-lane dim,
    the layout the flux tally measured at ~11 us/step vs ~38 for the
    j-major merged-row form (whose one-hot build transposes every
    lane-resident index). Value hi/lo bf16 splits are stacked along j
    (rows [0:ht) hi, [ht:2ht) lo) so each block row's one-hot streams
    through the MXU once.
    """
    blk = val_blk.shape[0]
    ht_pad = -(-ht // 8) * 8
    iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (2 * ht_pad, 1, 1), 0)
    j_fold = iota_j2 - np.int32(ht_pad) * (
        iota_j2 >= ht_pad).astype(jnp.int32)
    ohh_j2 = j_fold == t_hi_blk[None, :, :]
    vh, vl = _bf16_split(val_blk)
    vstk = jnp.where(iota_j2 < ht_pad, vh[None, :, :], vl[None, :, :])
    a = jnp.where(ohh_j2, vstk, jnp.bfloat16(0))  # [2*ht_pad, blk, p]
    dn = (((1,), (1,)), ((), ()))
    out = None
    for b_i in range(blk):
        t2 = jax.lax.dot_general(a[:, b_i, :], ohs_sub[b_i], dn,
                                 preferred_element_type=jnp.float32)
        out = t2 if out is None else out + t2
    return out[:ht_pad] + out[ht_pad:]


# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------

def _build_kernel(shape, pcfg: PallasConfig, source_kind: str, w_cols: int,
                  h_cells: int, ht: int, use_rr: bool,
                  uniform_ssa: bool = False, uniform_hg: bool = False,
                  macro_factor: int = 0, hti_pad: int = 8,
                  analytic_hg: bool = True, inv_hp: int = 8,
                  inv_n_steps: int = 0, n_comp: int = 1,
                  rec_cols: int = REC_COLS, lw: bool = False,
                  ha: int = 8, use_irr: bool = False,
                  use_fwd_table: bool = False, fwd_hf: int = 8,
                  fwd_n_s: int = 0, fwd_row_zero: bool = True,
                  hm_ct: int = 0, hb_cell: int = 0, nzp: int = 0,
                  brdf: str = "lambertian", cs_rows: int = 0,
                  sa_rows: int = 0):
    """Close over static shapes; returns the pallas kernel function.

    Grid EDGES are traced (read from the SMEM params vector per program) so
    one compiled kernel serves every same-shaped domain; only the cell
    COUNTS (nx, ny, nz) are static.

    Multi-component domains (n_comp 2..3) use the scattering-coefficient
    formulation: the record carries the cell's EFFECTIVE single-scattering
    albedo (sum_c frac_c * ssa_c) and cumulative *scattering*-coefficient
    fractions; a collision multiplies the weight by ssa_eff and selects the
    scattering component with <= 2 compares of one uniform against the
    gathered fractions. Identical means to the reference's
    extinction-fraction selection + per-component ssa
    (Integrators/monteCarloRadiativeTransfer.f95:759-771) with lower
    variance (standard non-analog absorption identity: absorbing by the
    mixture albedo and scattering by scattering fractions has the same
    expectation per event).
    """
    nx, ny, nz = shape
    nxy = nx * ny
    vol_base = -(-2 * nxy // 128) * 128
    vol_hi0 = vol_base // 128

    rows, blk, k_steps = pcfg.rows, pcfg.block_rows, pcfg.steps_per_call
    n_blocks = rows // blk
    # comma-set semantics, parsed ONCE: "all" enables every production
    # section; modifiers (stats/swrng/cheapu/...) never disable anything.
    # Substring checks bit us three times -- every token is matched by set
    # membership, never `in pcfg.debug_parts`.
    part_set = frozenset(pcfg.debug_parts.split(","))
    # hardware PRNG has no interpret-mode lowering; CPU tests use the
    # murmur mixer ("swrng" forces it on TPU for A/B validation)
    hw_rng = (not pcfg.interpret) and "swrng" not in part_set
    if "cheapu" in part_set:
        hw_rng = False
    oh_dtype = jnp.bfloat16 if pcfg.bf16 else jnp.float32
    # hi-first table gathers (_hif_gather2) for the big stacked tables
    # (inverse CDF, forward phase, emission alias); "nohif" forces the
    # lo-first one-hot form for A/B. Must agree with the packing choice
    # in run_batch_pallas (both derive from pcfg.debug_parts).
    hif = "nohif" not in part_set
    # INVERSE-CDF fetch variants (must agree with run_batch_pallas'
    # packing choice): default = WIDE exact-f32 (_hif_gather2w, one
    # table read for all block rows); "rowhif" forces the per-row f32
    # form; "bf16hif" the bf16-split per-row form (measured SLOWER on
    # hardware than f32 per-row -- 14.5 vs 19.7 M/s on the 9001x5
    # bench -- kept for A/B only).
    hifb = hif and "bf16hif" in part_set
    hifw = hif and not hifb and "rowhif" not in part_set

    n_dirs, k_dda = pcfg.n_dirs, pcfg.k_dda
    # per-direction march formulation ("cell"/"colct"): the combined
    # march table in bm_hi packs the colct 3-split block (rows
    # [0, 3*hm_ct)) followed by the cell hi/lo block (rows
    # [3*hm_ct, 3*hm_ct + 2*hb_cell)); each gather dots only its block
    march_dirs = (pcfg.march_dirs if len(pcfg.march_dirs) == n_dirs
                  else (pcfg.march_mode,) * n_dirs)
    c0_cell = 3 * hm_ct

    def kernel(scal_ref, par_ref, dirs_ref,
               x_in, y_in, z_in, ux_in, uy_in, uz_in, w_in,
               quota_in, alive_in, bl_in,
               b_hi_ref, b_lo_ref, bm_hi_ref, bm_lo_ref, inv_ref, ea_ref,
               fwd_ref, sa_ref, jmod_ref, acc_in, acci_in, acce_in,
               x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref, w_ref,
               quota_ref, alive_ref, bl_ref, acc_ref, acci_ref, acce_ref,
               nstat_ref):
        # Grid = (k_steps, n_blocks): the body is ONE transport step for ONE
        # block -- a small compile unit; Mosaic iterates it sequentially.
        # All buffers use constant index maps so they stay VMEM-resident
        # across the whole grid (fetched once, written back at the end).
        k_idx = pl.program_id(0)
        b_idx = pl.program_id(1)

        # state inputs are aliased onto the outputs; copy through once (at
        # the first program) so the kernel also works un-aliased
        # (interpreter mode), then operate exclusively on the output refs
        @pl.when((k_idx == 0) & (b_idx == 0))
        def _init():
            for src, dst in ((x_in, x_ref), (y_in, y_ref), (z_in, z_ref),
                             (ux_in, ux_ref), (uy_in, uy_ref),
                             (uz_in, uz_ref), (w_in, w_ref),
                             (quota_in, quota_ref), (alive_in, alive_ref),
                             (bl_in, bl_ref), (acc_in, acc_ref),
                             (acci_in, acci_ref), (acce_in, acce_ref)):
                dst[:] = src[:]
            for _j in range(8):  # SMEM takes scalar stores only
                nstat_ref[0, _j] = 0.0

        seed = scal_ref[0]
        step0 = scal_ref[1]
        beta_max = par_ref[0, 0]
        inv_beta_max = par_ref[0, 1]
        albedo = par_ref[0, 2]
        smu = par_ref[0, 3]    # source |mu0|
        sphi = par_ref[0, 4]   # source azimuth
        rr_w = par_ref[0, 5]
        x0 = par_ref[0, 6]
        lx = par_ref[0, 7]
        y0 = par_ref[0, 8]
        ly = par_ref[0, 9]
        z0 = par_ref[0, 10]
        lz = par_ref[0, 11]
        inv_dx = nx / lx
        inv_dy = ny / ly
        inv_dz = nz / lz
        z_max = z0 + lz
        z_eps = lz * _TOP_EPS

        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128, 128), 2)
        if pcfg.dyn_gather:
            # the dynamic-gather path never contracts over the one-hot
            # W axis; skip the [blk, 128, w_cols] iotas (Mosaic lowers
            # every traced eqn -- dead iotas are not free)
            iota_w_div = iota_w_mod = None
        else:
            iota_w = jax.lax.broadcasted_iota(
                jnp.int32, (blk, 128, w_cols), 2)
            iota_w_div = iota_w // rec_cols
            iota_w_mod = iota_w % rec_cols
        lane0 = (jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 0)
                 * np.uint32(128)
                 + jax.lax.broadcasted_iota(jnp.uint32, (blk, 128), 1))
        seed_u = seed.astype(jnp.uint32)

        # One transport step for one [blk, 128] block of lanes. Everything
        # is ref-mediated per block (load slice -> compute -> store slice)
        # so no intermediate outlives a block iteration: the Mosaic register
        # allocator reuses one block's worth of VMEM instead of keeping all
        # blocks' one-hot tensors live (which spills ~40x the state size).
        def block_step(b, ctr_i32, started):
            ctr = ctr_i32.astype(jnp.uint32)
            sl = pl.ds(b * blk, blk)
            if hw_rng:
                # Hardware PRNG: ~free vs the murmur mixer's int32
                # multiplies (emulated on the VPU; measured ~40 us/step at
                # 65k lanes). Seeded per (seed, step, block) so draws stay
                # deterministic in (key, call sequence); sites are consumed
                # in program order, one [blk, 128] word block per draw.
                # (prng_seed takes at most 2 values: fold (step, block) into
                # one -- steps are bounded by max_steps so this can't wrap)
                pltpu.prng_seed(seed, ctr_i32 * np.int32(n_blocks) + b)

                def uniform(counter, site):
                    del counter, site  # order-keyed, not site-keyed
                    bits = pltpu.prng_random_bits((blk, 128))
                    # bits arrive as int32: bitcast to uint32 BEFORE the
                    # shift or the sign bit leaks into the mantissa
                    ub = pltpu.bitcast(bits, jnp.uint32) >> np.uint32(8)
                    x24 = jax.lax.bitcast_convert_type(ub, jnp.int32)
                    return x24.astype(jnp.float32) * np.float32(2.0 ** -24)
            else:
                uniform = _make_uniform(
                    lane0 + np.uint32(blk * 128) * b.astype(jnp.uint32),
                    seed_u,
                    mode=("cheap" if "cheapu" in part_set
                          else "murmur"),
                    ctr_f32=ctr_i32.astype(jnp.float32)
                    if "cheapu" in part_set else None)
            x, y, z = x_ref[sl], y_ref[sl], z_ref[sl]
            ux, uy, uz = ux_ref[sl], uy_ref[sl], uz_ref[sl]
            w = w_ref[sl]
            alive = alive_ref[sl] > 0
            quota = quota_ref[sl]
            bl = bl_ref[sl]  # carried local (macro-block) majorant

            # ---- refill dead lanes from the source ----
            need = (~alive) & (quota > 0)
            u0 = uniform(ctr, 0)
            u1 = uniform(ctr, 1)
            atm_emit = None
            birth_cell = None
            if source_kind == illumination.EMISSION:
                # BBEmission refill, TPU-first: the surface/atmosphere
                # split is one uniform vs fracAtmsPower; the emitting
                # voxel comes from a Walker ALIAS table (O(1): bin pick +
                # accept/alias, ONE factorized table gather) instead of
                # the reference's CDF bisection (reference:
                # src/monteCarloIllumination.f95:431-522, :495-498).
                atms_frac = par_ref[0, 16]
                u_split = uniform(ctr, 10)
                u_bin = uniform(ctr, 11)
                u_acc = uniform(ctr, 12)
                u_mu = uniform(ctr, 13)
                u_zo = uniform(ctr, 2)
                from_atm = u_split < atms_frac
                n_cells_t = nx * ny * nz
                jbin = jnp.minimum(
                    (u_bin * np.float32(n_cells_t)).astype(jnp.int32),
                    np.int32(n_cells_t - 1))
                # gather (prob, alias) for this bin. hif: exact-f32
                # hi-first gather ([256, ha] transposed table); else
                # ea_ref rows [0:ha] prob_hi, [ha:2ha] prob_lo,
                # [2ha:3ha] alias_hi, [3ha:4ha] alias_lo -- bf16 hi/lo
                # splits reconstruct both to f32/integer exactness
                lo_b = jnp.bitwise_and(jbin, 127)
                hi_b = jnp.right_shift(jbin, 7)
                if hif:
                    p_j, a_j = _hif_gather2(ea_ref, ha, hi_b, lo_b, blk)
                else:
                    iota_sub_e = jax.lax.broadcasted_iota(
                        jnp.int32, (blk, 128, 128), 1)
                    ohs_e = (lo_b[:, None, :] == iota_sub_e).astype(
                        oh_dtype)
                    rws_e = [jnp.dot(ea_ref[:], ohs_e[b_i3],
                                     preferred_element_type=jnp.float32)
                             for b_i3 in range(blk)]
                    t3e = jnp.stack(rws_e, axis=0)  # [blk, 4*ha, 128]
                    rows_e = jax.lax.broadcasted_iota(
                        jnp.int32, (blk, 4 * ha, 128), 1)
                    p_j = (jnp.sum(t3e * (rows_e == hi_b[:, None, :]),
                                   axis=1)
                           + jnp.sum(t3e * (rows_e
                                            == (ha + hi_b)[:, None, :]),
                                     axis=1))
                    a_j = (jnp.sum(
                        t3e * (rows_e == (2 * ha + hi_b)[:, None, :]),
                        axis=1)
                        + jnp.sum(
                            t3e * (rows_e == (3 * ha + hi_b)[:, None, :]),
                            axis=1))
                v_cell = jnp.where(u_acc < p_j, jbin,
                                   (a_j + 0.5).astype(jnp.int32))
                # decompose v = (ix*ny + iy)*nz + iz. f32-exact floored
                # divides: (v + 0.5)/d lies strictly inside (q, q+1) and
                # the f32 relative error (~result * 2^-23) is far below
                # the 0.5/d margin for every in-envelope domain shape.
                vf = v_cell.astype(jnp.float32)
                colf = jnp.floor((vf + 0.5) * np.float32(1.0 / nz))
                izf = vf - colf * nz
                ixf = jnp.floor((colf + 0.5) * np.float32(1.0 / ny))
                iyf = colf - ixf * ny
                xa = x0 + (ixf + u0) * (lx / nx)
                ya = y0 + (iyf + u1) * (ly / ny)
                za = jnp.clip(z0 + (izf + u_zo) * (lz / nz),
                              z0 + z_eps, z_max - z_eps)
                # atmosphere: isotropic with a minimum-|mu| guard;
                # surface: Lambertian up (reference:
                # src/monteCarloIllumination.f95:487-509)
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
                birth_cell = v_cell
                atm_emit = need & from_atm
                # LW radiance: freshly emitted lanes contribute their
                # emission local estimate THIS step and start transport
                # next step, so every lane has at most one LE march per
                # step (reference credits emission to the radiances at
                # photon birth: Integrators/
                # monteCarloRadiativeTransfer.f95:510-542)
                fresh_hold = need if (lw and n_dirs > 0) else None
                sfc_emit = need & ~from_atm
            else:
                fresh_hold = None
                sfc_emit = None
                x = jnp.where(need, x0 + u0 * lx, x)
                y = jnp.where(need, y0 + u1 * ly, y)
                z = jnp.where(need, z_max - z_eps, z)
            if source_kind == illumination.DIRECTIONAL:
                # the beam direction is a constant: host-precomputed
                # cosines (params 14/15) skip per-step cos/sin/sqrt
                s_mu = -smu
                sux = jnp.broadcast_to(par_ref[0, 14], (blk, 128))
                suy = jnp.broadcast_to(par_ref[0, 15], (blk, 128))
            elif source_kind == illumination.SPOTLIGHT:
                # fixed fractional position (params 17/18), fixed beam
                # (reference: src/monteCarloIllumination.f95:178-216)
                x = jnp.where(need, x0 + par_ref[0, 17] * lx, x)
                y = jnp.where(need, y0 + par_ref[0, 18] * ly, y)
                s_mu = -smu
                sux = jnp.broadcast_to(par_ref[0, 14], (blk, 128))
                suy = jnp.broadcast_to(par_ref[0, 15], (blk, 128))
            elif source_kind == illumination.RANDOM_AZIMUTH:
                s_mu = -smu
                s_phi = 2.0 * np.pi * uniform(ctr, 2)
                s_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - s_mu * s_mu))
                sux = s_sin * jnp.cos(s_phi)
                suy = s_sin * jnp.sin(s_phi)
            elif source_kind == illumination.FLUX:
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

            # ---- Woodcock jump ----
            u_tau = uniform(ctr, 3)
            tau = -jnp.log1p(-u_tau)
            if macro_factor > 0:
                # Two-level majorant: jump against the carried macro-block
                # ceiling, clipped at the block face (a null step; the
                # local majorant is only valid within its block). Fresh
                # photons start with the (always valid) global majorant.
                # (reference analog: the XLA kernel's use_macro path,
                # transport/integrator.py, itself re-designing the
                # reference's max cross-section mode.)
                bl = jnp.where(need, beta_max, bl)
                bx_w = lx / nx * macro_factor
                by_w = ly / ny * macro_factor
                bz_w = lz / nz * macro_factor
                clip_nudge = 1e-5 * jnp.minimum(bx_w,
                                                jnp.minimum(by_w, bz_w))
                # faces CLAMPED to the domain edge: with nx/ny/nz not
                # divisible by macro_factor the last partial block's
                # outer face is VIRTUAL (past the periodic seam); an
                # unclamped jump would cross the x/y wrap into a block
                # whose majorant can exceed the carried bl (systematic
                # under-attenuation along the seam)
                tx = (jnp.clip((jnp.floor((x - x0) / bx_w)
                                + (ux >= 0)) * bx_w, 0.0, lx)
                      + x0 - x)
                ty = (jnp.clip((jnp.floor((y - y0) / by_w)
                                + (uy >= 0)) * by_w, 0.0, ly)
                      + y0 - y)
                tz = (jnp.clip((jnp.floor((z - z0) / bz_w)
                                + (uz >= 0)) * bz_w, 0.0, lz)
                      + z0 - z)
                tx = jnp.where(jnp.abs(ux) > 1e-12,
                               tx / jnp.where(ux == 0, 1.0, ux), 3e38)
                ty = jnp.where(jnp.abs(uy) > 1e-12,
                               ty / jnp.where(uy == 0, 1.0, uy), 3e38)
                tz = jnp.where(jnp.abs(uz) > 1e-12,
                               tz / jnp.where(uz == 0, 1.0, uz), 3e38)
                t_raw = jnp.minimum(tx, jnp.minimum(ty, tz))
                # a photon exactly ON an outward face takes one
                # global-majorant step instead (guaranteed progress)
                escape = t_raw <= 0.0
                bl = jnp.where(escape, beta_max, bl)
                d_samp = jnp.where(bl > 0, tau / jnp.where(bl == 0, 1.0, bl),
                                   jnp.float32(3e38))
                t_clip = jnp.where(escape, jnp.float32(3e38),
                                   t_raw + clip_nudge)
                clipped = t_clip < d_samp
                d = jnp.minimum(d_samp, t_clip)
            else:
                d = tau * inv_beta_max
                clipped = jnp.zeros((blk, 128), bool)
            zn = z + uz * d
            exit_top = alive & (zn >= z_max)
            exit_bot = alive & ~exit_top & (zn <= z0)
            moved = alive & ~exit_top & ~exit_bot
            collide = moved & ~clipped
            if fresh_hold is not None:
                # held lanes neither move nor tally this step
                exit_top = exit_top & ~fresh_hold
                exit_bot = exit_bot & ~fresh_hold
                moved = moved & ~fresh_hold
                collide = collide & ~fresh_hold

            # boundary crossing point (for exit tallies + reflection)
            if "nocoord" in part_set:  # perf bisection only
                xe, ye = x, y
                col_e = jnp.zeros((blk, 128), jnp.int32)
                xc, yc = x + ux * d, y + uy * d
                zc = jnp.clip(zn, z0, z_max)
                cell = jnp.zeros((blk, 128), jnp.int32)
                col_c = cell
            else:
                z_b = jnp.where(exit_top, z_max, z0)
                safe_uz = jnp.where(jnp.abs(uz) < 1e-12, 1.0, uz)
                t_b = (z_b - z) / safe_uz
                xe = x0 + jnp.mod(x + ux * t_b - x0, lx)
                ye = y0 + jnp.mod(y + uy * t_b - y0, ly)
                ixe = jnp.clip(((xe - x0) * inv_dx).astype(jnp.int32),
                               0, nx - 1)
                iye = jnp.clip(((ye - y0) * inv_dy).astype(jnp.int32),
                               0, ny - 1)
                col_e = ixe * ny + iye

                # collision cell
                xc = x0 + jnp.mod(x + ux * d - x0, lx)
                yc = y0 + jnp.mod(y + uy * d - y0, ly)
                zc = jnp.clip(zn, z0, z_max)
                ix = jnp.clip(((xc - x0) * inv_dx).astype(jnp.int32),
                              0, nx - 1)
                iy = jnp.clip(((yc - y0) * inv_dy).astype(jnp.int32),
                              0, ny - 1)
                iz = jnp.clip(((zc - z0) * inv_dz).astype(jnp.int32),
                              0, nz - 1)
                cell = (ix * ny + iy) * nz + iz
                col_c = ix * ny + iy
            # with a macro majorant, clipped (null-step) lanes also need
            # the gather: it carries the destination block's majorant
            cell = jnp.where(moved if macro_factor > 0 else collide,
                             cell, 0)

            u_col = uniform(ctr, 4)
            u_ang = uniform(ctr, 5)
            u_phi = uniform(ctr, 6)
            u_cmp = uniform(ctr, 8) if n_comp > 1 else None
            phi_rot = 2.0 * np.pi * u_phi

            # Combined one-hot index: ONE [blk, 128, 128] lo one-hot serves
            # both the record gather and the fused tally. Colliders use
            # lo(cell) for both (vol_base is 128-aligned so
            # lo(vol_base + cell) == lo(cell)); exit lanes substitute their
            # boundary-tally index (their gather outputs are never used).
            exits = exit_top | exit_bot
            t_exit = jnp.where(exit_top, col_e, nxy + col_e)
            oh_idx = jnp.where(exits, t_exit, cell)

            # ---- factorized record gather (MXU) ----

            def en(name):
                return "all" in part_set or name in part_set

            maj_dest = None
            ohs_sub = None
            g = None
            # record columns the gather must extract (one masked-reduce
            # pass each over [blk, W, 128]; skip what uniform flags or the
            # component count make unnecessary)
            if n_comp == 1:
                gather_fields = ((0,) + (() if uniform_ssa else (1,))
                                 + (() if uniform_hg else (2,))
                                 + ((3,) if macro_factor > 0 else ()))
            else:
                gather_fields = ((0,)
                                 + ((1,) if macro_factor > 0 else ())
                                 + (2, 3, 5, 6)
                                 + ((4, 7) if n_comp == 3 else ()))
            if "g1" in part_set:  # perf bisection: one-hot + single dot only
                oh_lo = _onehot_lo(cell, iota_lane)
                oh2 = oh_lo.reshape(blk * 128, 128)
                t = jnp.dot(oh2, b_hi_ref[:],
                            preferred_element_type=jnp.float32)
                g3 = t[:, :8].reshape(blk, 128, 8)
                beta = g3[:, :, 0] + beta_max * 0.5
                ssa = jnp.full((blk, 128), 0.99)
                g_hg = jnp.full((blk, 128), 0.85)
            elif "g0" in part_set:  # one-hot construction only, no matmul
                oh_lo = _onehot_lo(cell, iota_lane)
                beta = (oh_lo[:, :, 0].astype(jnp.float32)
                        + beta_max * 0.5)
                ssa = jnp.full((blk, 128), 0.99)
                g_hg = jnp.full((blk, 128), 0.85)
                oh_lo = None
            elif "g2" in part_set:  # + b_lo dot + hi mask + product (no fold)
                oh_lo = _onehot_lo(cell, iota_lane)
                oh2 = oh_lo.reshape(blk * 128, 128)
                t = jnp.dot(oh2, b_hi_ref[:],
                            preferred_element_type=jnp.float32)
                hi = jnp.right_shift(cell, 7)
                m = (iota_w_div == hi[:, :, None]).astype(
                    jnp.float32).reshape(blk * 128, w_cols)
                s = t * m
                g3 = s[:, :8].reshape(blk, 128, 8)
                beta = g3[:, :, 0] + beta_max * 0.5
                ssa = jnp.full((blk, 128), 0.99)
                g_hg = jnp.full((blk, 128), 0.85)
                oh_lo = None
            elif "g4" in part_set:  # full gather, single extracted column
                oh_lo = _onehot_lo(cell, iota_lane, oh_dtype)
                g4 = _gather_records(
                    cell, oh_lo,
                    (b_hi_ref[:], b_lo_ref[:] if pcfg.bf16 else None),
                    iota_w_div, iota_w_mod, fields=(0,))
                beta = g4[0]
                ssa = jnp.full((blk, 128), 0.99)
                g_hg = jnp.full((blk, 128), 0.85)
                oh_lo = None
            elif en("gather") and pcfg.dyn_gather:
                # Dynamic-gather record fetch: per-lane same-shape
                # take_along_axis (tpu.dynamic_gather) from the f32
                # record rows -- one gather + select per (field, table
                # row), no one-hot, no MXU, exact (no bf16 split).
                # Engaged for field x row budgets <= _DYN_GATHER_MAX_OPS
                # where the select chain beats the one-hot dot (measured
                # 4x at the step cloud's 8-row table: EXPERIMENTS_1e8.md
                # round 4, tools/probe_gather2.py).
                lo_g = jnp.bitwise_and(cell, 127)
                hi_g = jnp.right_shift(cell, 7)
                g = {}
                for r in gather_fields:
                    v_g = jnp.zeros((blk, 128), jnp.float32)
                    for h_g in range(h_cells):
                        row_g = jnp.broadcast_to(
                            b_hi_ref[h_g * rec_cols + r:
                                     h_g * rec_cols + r + 1, :],
                            (blk, 128))
                        got = jnp.take_along_axis(row_g, lo_g, axis=1)
                        v_g = jnp.where(hi_g == h_g, got, v_g)
                    g[r] = v_g
                oh_lo = None
                if not pcfg.flux_abs_2d:
                    # the fused tally still contracts a sublane one-hot
                    # (a scatter cannot be a gather); flux_abs_2d builds
                    # its own column-keyed one-hot in the tally section
                    lo_s = jnp.bitwise_and(oh_idx, 127)
                    iota_sub_d = jax.lax.broadcasted_iota(
                        jnp.int32, (blk, 128, 128), 1)
                    ohs_sub = (lo_s[:, None, :] == iota_sub_d).astype(
                        oh_dtype)
            elif en("gather") and "oldgather" not in part_set:
                # Sublane-layout gather (production default). The photon
                # index stays in the lane dim end-to-end: the one-hot is
                # [blk, 128lo, 128p] (no transpose-broadcast -- the minor-
                # dim one-hot layout hid a photon-lane -> sublane transpose
                # costing ~46 us/step), contracted by per-sublane-row small
                # MXU dots, with extraction by sublane-dim masked reduce
                # (~10 us/step total vs ~97 for the transposed layout).
                lo_s = jnp.bitwise_and(oh_idx, 127)
                iota_sub = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, 128, 128), 1)
                ohs = (lo_s[:, None, :] == iota_sub).astype(oh_dtype)
                bth = b_hi_ref[:].T  # [W, 128lo]
                btl = b_lo_ref[:].T if pcfg.bf16 else None
                t_rows = []
                for b_i in range(blk):
                    tb = jnp.dot(bth, ohs[b_i],
                                 preferred_element_type=jnp.float32)
                    if btl is not None:
                        tb = tb + jnp.dot(
                            btl, ohs[b_i],
                            preferred_element_type=jnp.float32)
                    t_rows.append(tb)  # [W, 128p]
                t3 = jnp.stack(t_rows, axis=0)  # [blk, W, 128p]
                iota_ws = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, w_cols, 128), 1)
                hi_s = jnp.right_shift(cell, 7)
                s3 = t3 * ((iota_ws // rec_cols) ==
                           hi_s[:, None, :]).astype(jnp.float32)
                g = {r: jnp.sum(s3 * ((iota_ws % rec_cols) == r), axis=1)
                     for r in gather_fields}
                oh_lo = None  # tally may reuse ohs (sublane orientation)
                ohs_sub = ohs
            elif en("gather"):
                oh_lo = _onehot_lo(oh_idx, iota_lane, oh_dtype)
                g = _gather_records(
                    cell, oh_lo,
                    (b_hi_ref[:], b_lo_ref[:] if pcfg.bf16 else None),
                    iota_w_div, iota_w_mod, fields=gather_fields)
            else:  # perf bisection only
                oh_lo = None
                beta = jnp.full((blk, 128), beta_max)
                ssa = jnp.full((blk, 128), 0.99)
                g_hg = jnp.full((blk, 128), 0.85)

            if g is not None:
                # shared extraction + (multi-component) selection
                beta = g[0]
                if n_comp == 1:
                    ssa = (jnp.full((blk, 128), par_ref[0, 12])
                           if uniform_ssa else g[1])
                    g_hg = (jnp.full((blk, 128), par_ref[0, 13])
                            if uniform_hg else g[2])
                    maj_dest = g[3] if macro_factor > 0 else None
                else:
                    # layout (rec_cols=8): [beta, maj, ssa_eff, cs0, cs1,
                    # f2_0, f2_1, f2_2]; f2 is the HG asymmetry (analytic)
                    # or the GLOBAL stacked phase row (tabulated) of the
                    # component. One uniform selects the scattering
                    # component against the cumulative scattering fractions
                    # (reference bisection at ncomp <= 3:
                    # Integrators/monteCarloRadiativeTransfer.f95:759-760).
                    ssa = g[2]
                    if n_comp == 2:
                        g_hg = jnp.where(u_cmp >= g[3], g[6], g[5])
                    else:
                        g_hg = jnp.where(
                            u_cmp >= g[4], g[7],
                            jnp.where(u_cmp >= g[3], g[6], g[5]))
                    maj_dest = g[1] if macro_factor > 0 else None

            # null-collision test against the majorant this step SAMPLED
            # with (the carried value), then carry the destination block's
            # majorant for the next step
            ceiling = bl if macro_factor > 0 else beta_max
            real = collide & (u_col * ceiling < beta)
            if macro_factor > 0 and maj_dest is not None:
                bl = jnp.where(moved, maj_dest, bl)
            absorbed = jnp.where(real, w * (1.0 - ssa), 0.0)
            w = jnp.where(real, w * ssa, w)
            if n_dirs > 0:
                # local estimation uses the post-absorption pre-roulette
                # weight and the INCOMING direction (reference:
                # Integrators/monteCarloRadiativeTransfer.f95:776-790)
                w_int = w
                ux_in0, uy_in0, uz_in0 = ux, uy, uz
                if pcfg.intensity_limit:
                    # scattering component slot for the capped-excess
                    # attribution (slot 0 = surface/emission; reference
                    # component-0 attribution,
                    # Drivers/monteCarloDriver.f95:294-322)
                    if n_comp == 1 or g is None:
                        slot_sc = jnp.ones((blk, 128), jnp.int32)
                    elif n_comp == 2:
                        slot_sc = 1 + (u_cmp >= g[3]).astype(jnp.int32)
                    else:
                        slot_sc = (1 + (u_cmp >= g[3]).astype(jnp.int32)
                                   + (u_cmp >= g[4]).astype(jnp.int32))

            # ---- Russian roulette ----
            if use_rr:
                u_rr = uniform(ctr, 7)
                play = real & (w < 0.5 * rr_w)
                survive = u_rr < w / rr_w
                w = jnp.where(play, jnp.where(survive, rr_w, 0.0), w)
            died_weight = real & (w <= _TINY)

            # ---- HG scattering ----
            scatter = real & ~died_weight
            if "noscat" in part_set:  # perf bisection only
                cos_phi = jnp.cos(phi_rot)
                sin_phi = jnp.sin(phi_rot)
                ux = jnp.where(scatter, ux + u_ang * np.float32(1e-9), ux)
            else:
                if analytic_hg:
                    g_safe = jnp.where(jnp.abs(g_hg) < 1e-5, 1.0, g_hg)
                    s_ = (1.0 - g_hg * g_hg) / (1.0 - g_hg
                                                + 2.0 * g_hg * u_ang)
                    ct = (1.0 + g_hg * g_hg - s_ * s_) / (2.0 * g_safe)
                    cos_theta = jnp.where(jnp.abs(g_hg) < 1e-5,
                                          2.0 * u_ang - 1.0,
                                          jnp.clip(ct, -1.0, 1.0))
                else:
                    # tabulated phase function: inverse-CDF angle lookup
                    # (field 2 carries the per-cell phase index; matches
                    # sample_scattering_cos / the reference's
                    # computeScatteringAngle,
                    # Integrators/monteCarloRadiativeTransfer.f95:1594)
                    t_u = u_ang * np.float32(inv_n_steps - 1)
                    k_i = jnp.clip(t_u.astype(jnp.int32), 0,
                                   inv_n_steps - 2)
                    frac_i = t_u - k_i.astype(jnp.float32)
                    flat_i = (g_hg.astype(jnp.int32)
                              * np.int32(inv_n_steps) + k_i)
                    lo_i = jnp.bitwise_and(flat_i, 127)
                    hi_i = jnp.right_shift(flat_i, 7)
                    if hifb:
                        a0, dd = _hif_gather2b(inv_ref, inv_hp, hi_i,
                                               lo_i, blk)
                    elif hifw:
                        a0, dd = _hif_gather2w(inv_ref, inv_hp, hi_i,
                                               lo_i, blk)
                    elif hif:
                        a0, dd = _hif_gather2(inv_ref, inv_hp, hi_i,
                                              lo_i, blk)
                    else:
                        iota_sub_i = jax.lax.broadcasted_iota(
                            jnp.int32, (blk, 128, 128), 1)
                        ohs_i = (lo_i[:, None, :] == iota_sub_i).astype(
                            oh_dtype)
                        rws_i = [jnp.dot(
                            inv_ref[:], ohs_i[b_i2],
                            preferred_element_type=jnp.float32)
                            for b_i2 in range(blk)]
                        # [blk, 3*hp, 128p]
                        t3i = jnp.stack(rws_i, axis=0)
                        rows_i = jax.lax.broadcasted_iota(
                            jnp.int32, (blk, 3 * inv_hp, 128), 1)
                        a0h = jnp.sum(
                            t3i * (rows_i == hi_i[:, None, :]), axis=1)
                        a0l = jnp.sum(
                            t3i * (rows_i
                                   == (inv_hp + hi_i)[:, None, :]),
                            axis=1)
                        dd = jnp.sum(
                            t3i * (rows_i
                                   == (2 * inv_hp + hi_i)[:, None, :]),
                            axis=1)
                        a0 = a0h + a0l
                    angle = a0 + frac_i * dd
                    cos_theta = jnp.cos(angle)
                sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta ** 2))
                cos_phi = jnp.cos(phi_rot)
                sin_phi = jnp.sin(phi_rot)
                denom_sq = jnp.maximum(1.0 - uz * uz, 0.0)
                denom = jnp.sqrt(denom_sq)
                safe = denom > 1e-6
                inv_denom = jnp.where(safe,
                                      1.0 / jnp.maximum(denom, 1e-12), 0.0)
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
                oz = jnp.where(
                    jnp.abs(oz) < 1e-4,
                    jnp.sign(jnp.where(oz == 0, 1.0, oz)) * 1e-4, oz)
                inv_norm = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz)
                ux = jnp.where(scatter, ox * inv_norm, ux)
                uy = jnp.where(scatter, oy * inv_norm, uy)
                uz = jnp.where(scatter, oz * inv_norm, uz)

            # ---- surface reflection (Lambertian or uniform RPV) ----
            w_down = w
            mu_new = jnp.sqrt(jnp.maximum(u_ang, np.float32(1e-12)))
            sin_new = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_new * mu_new))
            if brdf == "rpv":
                # Rahman-Pinty-Verstraete weight for the cosine-sampled
                # outgoing direction, trig-free for Mosaic: cos(dphi)
                # from direction components, tan(acos(mu)) = s/mu.
                # Matches physics/surface.py:rpv_reflectance (the XLA
                # path); reference extension point:
                # src/surfaceProperties.f95:119-147. exit_bot lanes never
                # scatter this step, so ux/uy/uz still hold the INCOMING
                # direction here.
                rho0 = albedo
                k_rpv = par_ref[0, 20]
                th_rpv = par_ref[0, 21]
                mu_i = jnp.abs(uz)
                si = jnp.sqrt(jnp.maximum(0.0, 1.0 - uz * uz))
                mu_r = jnp.clip(mu_new, 1e-6, 1.0)
                si_safe = jnp.where(si < 1e-6, 1.0, si)
                cos_dphi = jnp.where(
                    si < 1e-6, 1.0,
                    (jnp.cos(phi_rot) * ux + jnp.sin(phi_rot) * uy)
                    / si_safe)
                cos_g = mu_i * mu_r + si * sin_new * cos_dphi
                minn_x = jnp.maximum(mu_i * mu_r * (mu_i + mu_r),
                                     np.float32(1e-12))
                minnaert = jnp.exp((k_rpv - 1.0) * jnp.log(minn_x))
                hg_d = jnp.maximum(
                    1.0 + th_rpv * th_rpv + 2.0 * th_rpv * cos_g,
                    np.float32(1e-12))
                hg_l = (1.0 - th_rpv * th_rpv) / (
                    hg_d * jnp.sqrt(hg_d))
                mu_ic = jnp.clip(mu_i, 1e-6, 1.0)
                ti = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_ic * mu_ic)) \
                    / mu_ic
                tr = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu_r * mu_r)) / mu_r
                cap_g = jnp.sqrt(jnp.maximum(
                    0.0, ti * ti + tr * tr - 2.0 * ti * tr * cos_dphi))
                refl = (rho0 * minnaert * hg_l
                        * (1.0 + (1.0 - rho0) / (1.0 + cap_g)))
                w_refl = w_down * refl
            elif brdf == "px":
                # Per-pixel Lambertian: the surface grid divides the
                # domain columns evenly (surface_px_ok), so the packed
                # per-COLUMN albedo row keyed by the landing column
                # col_e reproduces the reference's fractional surface
                # lookup exactly (src/surfaceProperties.f95:119-147).
                # Per-lane dynamic gather (tpu.dynamic_gather), f32.
                lo_sa = jnp.bitwise_and(col_e, 127)
                row0_sa = jnp.broadcast_to(sa_ref[0:1, :], (blk, 128))
                alb_px = jnp.take_along_axis(row0_sa, lo_sa, axis=1)
                if sa_rows > 1:
                    hi_sa = jnp.right_shift(col_e, 7)
                    for h_sa in range(1, sa_rows):
                        row_sa = jnp.broadcast_to(
                            sa_ref[h_sa:h_sa + 1, :], (blk, 128))
                        got_sa = jnp.take_along_axis(row_sa, lo_sa,
                                                     axis=1)
                        alb_px = jnp.where(hi_sa == h_sa, got_sa, alb_px)
                w_refl = w_down * alb_px
            else:
                w_refl = w_down * albedo
            died_surface = exit_bot & (w_refl <= _TINY)
            reflected = exit_bot & ~died_surface
            x = jnp.where(exit_bot, xe, jnp.where(moved, xc, x))
            y = jnp.where(exit_bot, ye, jnp.where(moved, yc, y))
            z = jnp.where(exit_bot, z0 + z_eps, jnp.where(moved, zc, z))
            ux = jnp.where(reflected, sin_new * jnp.cos(phi_rot), ux)
            uy = jnp.where(reflected, sin_new * jnp.sin(phi_rot), uy)
            uz = jnp.where(reflected, mu_new, uz)
            w = jnp.where(reflected, w_refl, w)
            if macro_factor > 0:
                # reflected photons restart at the surface with the (always
                # valid) global majorant; the next gather re-localizes it
                bl = jnp.where(exit_bot, beta_max, bl)

            alive = alive & ~exit_top & ~died_weight & ~died_surface

            # ---- in-kernel local estimation (radiance) ----
            # One DDA march per direction serves both event kinds this
            # step (scatter at the collision point with the HG phase
            # value, surface reflection with 1/pi -- the masks are
            # disjoint per lane). Exact estimator: contribution =
            # w * P/(4 pi mu_d) * exp(-tau_toa), tallied at the TOA exit
            # column. (reference:
            # Integrators/monteCarloRadiativeTransfer.f95:1623-1752)
            if n_dirs > 0 and "noint" not in part_set:
                ev = real | reflected
                sx = jnp.where(reflected, xe, xc)
                sy = jnp.where(reflected, ye, yc)
                sz = jnp.where(reflected, z0 + z_eps, zc)
                w_ev = jnp.where(reflected, w_refl, w_int)
                if fresh_hold is not None:
                    ev = ev | fresh_hold
                    sx = jnp.where(fresh_hold, x, sx)
                    sy = jnp.where(fresh_hold, y, sy)
                    sz = jnp.where(fresh_hold, z, sz)
                    w_ev = jnp.where(fresh_hold, 1.0, w_ev)
                if pcfg.intensity_limit:
                    # slot 0 = surface reflection / emission births
                    slot_ev = jnp.where(real, slot_sc, 0)
                dxc_ = lx / nx
                dyc_ = ly / ny
                dzc_ = lz / nz
                nudge = 1e-6 * jnp.minimum(dzc_, jnp.minimum(dxc_, dyc_))
                iota_sub_m = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, 128, 128), 1)
                any_cell_m = any(m not in ("colct", "colscan")
                                 for m in march_dirs)
                any_ct_m = any(m == "colct" for m in march_dirs)
                iota_cell_m = (jax.lax.broadcasted_iota(
                    jnp.int32, (blk, hb_cell, 128), 1)
                    if any_cell_m and not pcfg.dyn_march else None)
                iota_ct_m = (jax.lax.broadcasted_iota(
                    jnp.int32, (blk, hm_ct, 128), 1)
                    if any_ct_m else None)

                def gather_t3(idx_lo):
                    # cell march table: hi/lo bf16 splits stacked in the
                    # cell block of the combined table -- ONE
                    # [2*hb_cell, 128] dot per block row, folded (the
                    # round-2 form dotted hi and lo separately: 2x the
                    # MXU instructions for the same MACs)
                    ohs_m = (idx_lo[:, None, :] == iota_sub_m).astype(
                        oh_dtype)
                    tab = bm_hi_ref[c0_cell:c0_cell + 2 * hb_cell]
                    rws = []
                    for b_i2 in range(blk):
                        tb = jnp.dot(tab, ohs_m[b_i2],
                                     preferred_element_type=jnp.float32)
                        rws.append(tb[:hb_cell] + tb[hb_cell:2 * hb_cell])
                    return jnp.stack(rws, axis=0)  # [blk, hb_cell, 128]

                def gather_ct3(idx_lo):
                    # colct march table: THREE stacked bf16 splits of the
                    # per-column cumulative optical depth (CT magnitudes
                    # reach the column total tau, so a 2-way split's
                    # ~2^-17 * CT absolute error would leak ~1e-3 into
                    # small segment DIFFERENCES; 3 splits reconstruct to
                    # ~2^-27 * CT). One taller dot per block row, folded
                    # IMMEDIATELY so the live transient is [hm_ct, 128]
                    # per row, not a [blk, 3*hm_ct, 128] f32 stack.
                    ohs_m = (idx_lo[:, None, :] == iota_sub_m).astype(
                        oh_dtype)
                    tab = bm_hi_ref[0:3 * hm_ct]
                    rws = []
                    for b_i2 in range(blk):
                        tb = jnp.dot(tab, ohs_m[b_i2],
                                     preferred_element_type=jnp.float32)
                        rws.append(tb[:hm_ct] + tb[hm_ct:2 * hm_ct]
                                   + tb[2 * hm_ct:3 * hm_ct])
                    return jnp.stack(rws, axis=0)  # [blk, hm_ct, 128]

                def gather_beta(cellm):
                    # dedicated single-field table [hb_cell, 128lo]: the
                    # march needs only extinction, so the dot and the
                    # sublane extraction are ~REC_COLS*h/hb narrower than
                    # the full record gather
                    lo_m = jnp.bitwise_and(cellm, 127)
                    if pcfg.dyn_march:
                        # per-lane dynamic gather of the exact f32 rows
                        # (bm_lo slot) -- no one-hot, no MXU, no split
                        hi_md = jnp.right_shift(cellm, 7)
                        v_m = jnp.zeros((blk, 128), jnp.float32)
                        for h_m in range(h_cells):
                            # cell f32 rows sit AFTER the colscan block
                            row_m = jnp.broadcast_to(
                                bm_lo_ref[cs_rows + h_m:
                                          cs_rows + h_m + 1, :],
                                (blk, 128))
                            v_m = jnp.where(
                                hi_md == h_m,
                                jnp.take_along_axis(row_m, lo_m, axis=1),
                                v_m)
                        return v_m
                    t3m = gather_t3(lo_m)
                    hi_m = jnp.right_shift(cellm, 7)
                    s3m = t3m * (iota_cell_m ==
                                 hi_m[:, None, :]).astype(jnp.float32)
                    return jnp.sum(s3m, axis=1)

                def le_one_direction(d_i, k_this=k_dda,
                                     mode_this=pcfg.march_mode):
                    ddx = dirs_ref[0, d_i]
                    ddy = dirs_ref[1, d_i]
                    ddz = dirs_ref[2, d_i]  # > 0 by eligibility
                    cosb = ux_in0 * ddx + uy_in0 * ddy + uz_in0 * ddz
                    if use_fwd_table:
                        # tabulated (hybrid or original) phase values: the
                        # table is resampled uniform in s = sin(theta/2)
                        # so the index needs only a sqrt (no arccos in
                        # Mosaic); paired (v0 hi/lo, delta) gather like
                        # the inverse-CDF table (reference:
                        # lookUpPhaseFuncValsFromTable,
                        # Integrators/monteCarloRadiativeTransfer.f95:1834)
                        s_v = jnp.sqrt(jnp.maximum(
                            (1.0 - cosb) * 0.5, 0.0))
                        tpos = s_v * np.float32(fwd_n_s - 1)
                        k_f = jnp.clip(tpos.astype(jnp.int32), 0,
                                       fwd_n_s - 2)
                        frac_f = tpos - k_f.astype(jnp.float32)
                        if fwd_row_zero:
                            flat_f = k_f
                        else:
                            flat_f = (g_hg.astype(jnp.int32)
                                      * np.int32(fwd_n_s) + k_f)
                        lo_f = jnp.bitwise_and(flat_f, 127)
                        hi_f = jnp.right_shift(flat_f, 7)
                        if hif:
                            v0, dd_f = _hif_gather2(fwd_ref, fwd_hf,
                                                    hi_f, lo_f, blk)
                        else:
                            ohs_f = (lo_f[:, None, :]
                                     == iota_sub_m).astype(oh_dtype)
                            rws_f = [jnp.dot(
                                fwd_ref[:], ohs_f[b_i2],
                                preferred_element_type=jnp.float32)
                                for b_i2 in range(blk)]
                            # one shared fwd_hf-row hi mask, applied to
                            # the three stacked fields (v0 hi, v0 lo,
                            # delta) as SLICED views: they share the hi
                            # row index, so each reduce runs over fwd_hf
                            # rows instead of 3*fwd_hf -- the previous
                            # three full-height reduces were 3x the VPU
                            # work and showed up as per-direction fixed
                            # cost
                            t3f = jnp.stack(rws_f, axis=0)
                            rows_f = jax.lax.broadcasted_iota(
                                jnp.int32, (blk, fwd_hf, 128), 1)
                            m3 = (rows_f == hi_f[:, None, :]).astype(
                                jnp.float32)
                            v0h = jnp.sum(t3f[:, :fwd_hf] * m3, axis=1)
                            v0l = jnp.sum(
                                t3f[:, fwd_hf:2 * fwd_hf] * m3, axis=1)
                            dd_f = jnp.sum(
                                t3f[:, 2 * fwd_hf:3 * fwd_hf] * m3,
                                axis=1)
                            v0 = v0h + v0l
                        pv = v0 + frac_f * dd_f
                    else:
                        q_hg = jnp.maximum(
                            1.0 + g_hg * g_hg - 2.0 * g_hg * cosb, 1e-12)
                        pv = (1.0 - g_hg * g_hg) / (q_hg * jnp.sqrt(q_hg))
                    npf = jnp.where(reflected, np.float32(1.0 / np.pi),
                                    pv / (4.0 * np.pi * ddz))
                    if fresh_hold is not None:
                        # emission events: isotropic 1/(4 pi mu_d) for the
                        # atmosphere, Lambertian 1/pi for the surface
                        npf = jnp.where(
                            atm_emit, 1.0 / (4.0 * np.pi * ddz),
                            jnp.where(sfc_emit,
                                      np.float32(1.0 / np.pi), npf))
                    sdx = jnp.where(jnp.abs(ddx) > 1e-12, ddx, 1e-12)
                    sdy = jnp.where(jnp.abs(ddy) > 1e-12, ddy, 1e-12)
                    if use_irr:
                        # Iwabuchi RR thresholds are known BEFORE the
                        # march (that is the estimator's whole point:
                        # Integrators/monteCarloRadiativeTransfer.f95:
                        # 1753-1813) -- a lane whose tau passes tau_stop
                        # contributes 0 in every branch below, so the
                        # march can drop it immediately and the
                        # early-exit while loop ends as soon as the last
                        # active lane stops.
                        u_i1 = uniform(ctr, 16 + 2 * d_i)
                        u_itf = uniform(ctr, 17 + 2 * d_i)
                        tau_free = -jnp.log1p(-u_itf)
                        zeta = par_ref[0, 19]
                        npf_pi = np.float32(np.pi) * npf
                        small_c = npf_pi <= zeta
                        tau_max = -jnp.log(
                            zeta / jnp.maximum(npf_pi, _TINY))
                        tau_stop = jnp.where(small_c, tau_free,
                                             tau_max + tau_free)
                    else:
                        tau_stop = None

                    def m_body(it, carry, sdx=sdx, sdy=sdy, ddx=ddx,
                               ddy=ddy, ddz=ddz):
                        # all-i32/f32 carry: Mosaic fails to legalize
                        # scf.for with i1 (bool) loop carries
                        px, py, pz, tau, act_i, ex_col = carry
                        act = act_i > 0
                        pxw = x0 + jnp.mod(px - x0, lx)
                        pyw = y0 + jnp.mod(py - y0, ly)
                        # INDEX-SPACE directional nudge: the position
                        # nudge (ds + nudge) rounds away in f32 at large
                        # coordinates, landing steps exactly ON faces;
                        # for negative-direction components the truncated
                        # index then names the cell being LEFT and the
                        # march stalls until k_dda (silently dropping the
                        # contribution). Biasing the continuous index by
                        # +-1e-4 cells along the march direction assigns
                        # face-landings to the cell being ENTERED for
                        # either sign.
                        nde = np.float32(1e-4)
                        ixm = jnp.clip(((pxw - x0) * inv_dx
                                        + jnp.sign(ddx) * nde).astype(
                            jnp.int32), 0, nx - 1)
                        iym = jnp.clip(((pyw - y0) * inv_dy
                                        + jnp.sign(ddy) * nde).astype(
                            jnp.int32), 0, ny - 1)
                        izm = jnp.clip(((pz - z0) * inv_dz).astype(
                            jnp.int32), 0, nz - 1)
                        cellm = (ixm * ny + iym) * nz + izm
                        beta_m = gather_beta(cellm)
                        fx = jnp.where(ddx >= 0, ixm + 1, ixm).astype(
                            jnp.float32) * dxc_ + x0
                        fy = jnp.where(ddy >= 0, iym + 1, iym).astype(
                            jnp.float32) * dyc_ + y0
                        fz = (izm + 1).astype(jnp.float32) * dzc_ + z0
                        tx = jnp.where(jnp.abs(ddx) > 1e-12,
                                       (fx - pxw) / sdx, _BIG_F)
                        ty = jnp.where(jnp.abs(ddy) > 1e-12,
                                       (fy - pyw) / sdy, _BIG_F)
                        tz = (fz - pz) / ddz
                        ds = jnp.maximum(
                            jnp.minimum(tx, jnp.minimum(ty, tz)), 0.0
                        ) + nudge
                        tau = jnp.where(act, tau + beta_m * ds, tau)
                        pz2 = pz + ddz * ds
                        top = pz2 >= z_max
                        newly = act & top
                        tb_ = (z_max - pz) / ddz
                        exx = x0 + jnp.mod(pxw + ddx * tb_ - x0, lx)
                        exy = y0 + jnp.mod(pyw + ddy * tb_ - y0, ly)
                        exc = (jnp.clip(((exx - x0) * inv_dx).astype(
                            jnp.int32), 0, nx - 1) * ny
                            + jnp.clip(((exy - y0) * inv_dy).astype(
                                jnp.int32), 0, ny - 1))
                        ex_col = jnp.where(newly, exc, ex_col)
                        act = act & ~top
                        if tau_stop is not None:
                            act = act & (tau < tau_stop)
                        return (pxw + ddx * ds, pyw + ddy * ds, pz2,
                                tau, act.astype(jnp.int32), ex_col)

                    nzf = np.float32(nz)

                    def m_body_ct(it, carry, sdx=sdx, sdy=sdy, ddx=ddx,
                                  ddy=ddy, ddz=ddz):
                        # Column-crossing march: one gather per COLUMN
                        # crossed. Within a column the slant-path optical
                        # depth is exact from the per-column cumulative
                        # vertical optical depth CT (piecewise linear in
                        # z): integral(beta dl) = (CT(z_in)-CT(z_out))/mu
                        # (beta is cellwise constant, dl = dz/mu). z-face
                        # crossings therefore cost nothing; only
                        # horizontal (x/y face) crossings take an MXU
                        # gather -- typically ~5x fewer than cell faces.
                        px, py, pz, tau, act_i, ex_col = carry
                        act = act_i > 0
                        pxw = x0 + jnp.mod(px - x0, lx)
                        pyw = y0 + jnp.mod(py - y0, ly)
                        # index-space directional nudge, as in the cell
                        # march: face landings must name the column being
                        # ENTERED for either direction sign
                        nde = np.float32(1e-4)
                        ixm = jnp.clip(((pxw - x0) * inv_dx
                                        + jnp.sign(ddx) * nde).astype(
                            jnp.int32), 0, nx - 1)
                        iym = jnp.clip(((pyw - y0) * inv_dy
                                        + jnp.sign(ddy) * nde).astype(
                            jnp.int32), 0, ny - 1)
                        col = ixm * ny + iym
                        t3m = gather_ct3(jnp.bitwise_and(col, 127))
                        hi_m = jnp.right_shift(col, 7)
                        fx = jnp.where(ddx >= 0, ixm + 1, ixm).astype(
                            jnp.float32) * dxc_ + x0
                        fy = jnp.where(ddy >= 0, iym + 1, iym).astype(
                            jnp.float32) * dyc_ + y0
                        # singleton axes never change the column (the
                        # wrap re-enters the same column), so their faces
                        # need no crossings at all
                        if nx == 1:
                            tx = _BIG_F
                        else:
                            tx = jnp.where(jnp.abs(ddx) > 1e-12,
                                           (fx - pxw) / sdx, _BIG_F)
                        if ny == 1:
                            ty = _BIG_F
                        else:
                            ty = jnp.where(jnp.abs(ddy) > 1e-12,
                                           (fy - pyw) / sdy, _BIG_F)
                        # distance nudge: at a wrap seam the truncated
                        # index can name the column whose face is AT the
                        # current position (tx = 0), so a bare max(.., 0)
                        # stalls forever -- same hazard the cell march
                        # covers with ds + nudge
                        th = jnp.maximum(jnp.minimum(tx, ty), 0.0) + nudge
                        tt = (z_max - pz) / ddz
                        top = tt <= th
                        z_exit = jnp.where(top, z_max, pz + ddz * th)
                        # CT rows: base + k selects level k of THIS
                        # column; linear interpolation in the continuous
                        # level u is exact (CT piecewise linear). The
                        # (r+1) weights vanish exactly when u hits the
                        # top level, so they never leak into the next
                        # column's row block.
                        u_in = jnp.clip((pz - z0) * inv_dz, 0.0, nzf)
                        u_out = jnp.clip((z_exit - z0) * inv_dz, 0.0, nzf)
                        k_in = jnp.clip(u_in.astype(jnp.int32), 0, nz - 1)
                        f_in = u_in - k_in.astype(jnp.float32)
                        k_out = jnp.clip(u_out.astype(jnp.int32), 0, nz)
                        f_out = u_out - k_out.astype(jnp.float32)
                        base = hi_m * np.int32(nzp)
                        r_in = base + k_in
                        r_out = base + k_out
                        z3 = np.float32(0.0)
                        w3 = (jnp.where(iota_ct_m == r_in[:, None, :],
                                        (1.0 - f_in)[:, None, :], z3)
                              + jnp.where(
                                  iota_ct_m == (r_in + 1)[:, None, :],
                                  f_in[:, None, :], z3)
                              - jnp.where(
                                  iota_ct_m == r_out[:, None, :],
                                  (1.0 - f_out)[:, None, :], z3)
                              - jnp.where(
                                  iota_ct_m == (r_out + 1)[:, None, :],
                                  f_out[:, None, :], z3))
                        seg = jnp.sum(t3m * w3, axis=1)  # CT_in - CT_out
                        tau = jnp.where(act, tau + seg / ddz, tau)
                        newly = act & top
                        # the final segment stays within one column, so
                        # the TOA exit column IS the current column
                        ex_col = jnp.where(newly, col, ex_col)
                        act = act & ~top
                        if tau_stop is not None:
                            act = act & (tau < tau_stop)
                        return (pxw + ddx * th, pyw + ddy * th,
                                pz + ddz * th, tau,
                                act.astype(jnp.int32), ex_col)

                    if mode_this == "colscan":
                        # Closed-form COLUMN-SCAN march (ny == 1 domains):
                        # instead of DDA-stepping the ray (per-crossing
                        # per-LANE column gathers), loop over the domain's
                        # nx columns x W wraps with the column as the
                        # UNIFORM loop index -- the column's cumulative-
                        # optical-depth z-profile is then a dynamic 2-ROW
                        # VMEM read (no one-hot, no MXU), and the ray's
                        # crossing interval of that column is closed-form
                        # in the continuous column coordinate (the path to
                        # TOA is pure geometry: position + direction fix
                        # every crossing). Probe-measured 0.06 us/iter at
                        # 2048 lanes vs ~1.4 us/crossing for the one-hot
                        # colct iteration (tools/probe_tally.py, round 4).
                        # Same estimator as colct: within a column the
                        # slant-path optical depth is exact from CT
                        # (piecewise linear in z), tau += (CT(z_in) -
                        # CT(z_out)) / ddz.  (reference march:
                        # Integrators/monteCarloRadiativeTransfer.f95:
                        # 1623-1752; this is a TPU-native reformulation,
                        # not a translation.)
                        nxf_cs = np.float32(nx)
                        nzf_cs = np.float32(nz)
                        dsgn = jnp.where(ddx >= 0.0, 1.0, -1.0)
                        s0 = jnp.mod((sx - x0) * inv_dx, nxf_cs)
                        sig0 = dsgn * s0
                        slope = (dxc_ * ddz
                                 / jnp.maximum(jnp.abs(ddx), 1e-12))
                        z32 = jnp.zeros((blk, 128), jnp.float32)

                        def ct_cs(z, row_k, row_k1):
                            u = jnp.clip((z - z0) * inv_dz, 0.0, nzf_cs)
                            kz = jnp.minimum(u.astype(jnp.int32), nz - 1)
                            f = u - kz.astype(jnp.float32)
                            return (jnp.take_along_axis(row_k, kz, axis=1)
                                    * (1.0 - f)
                                    + jnp.take_along_axis(row_k1, kz,
                                                          axis=1) * f)

                        def m_body_cs(it, tau, ddz=ddz):
                            cc = jax.lax.rem(it, nx)
                            wf = (it // nx).astype(jnp.float32)
                            # physical column cc <-> sigma-residue a:
                            # ddx >= 0: a = cc; ddx < 0: a = nx - 1 - cc
                            af = jnp.where(dsgn > 0.0,
                                           cc.astype(jnp.float32),
                                           np.float32(nx - 1)
                                           - cc.astype(jnp.float32))
                            rows2 = bm_lo_ref[pl.ds(2 * cc, 2)]
                            row_k = jnp.broadcast_to(rows2[0:1, :],
                                                     (blk, 128))
                            row_k1 = jnp.broadcast_to(rows2[1:2, :],
                                                      (blk, 128))
                            # first unwrapped sigma-cell j == a (mod nx)
                            # with j + 1 > sig0 (floor+1, NOT ceil: an
                            # exactly-integer sig0 - 1 - a must still
                            # advance), then wraps w = 1..W-1 shift by nx
                            q = jnp.floor((sig0 - 1.0 - af)
                                          * np.float32(1.0 / nx)) + 1.0
                            j = af + nxf_cs * (q + wf)
                            z_i = jnp.minimum(
                                sz + jnp.maximum(j - sig0, 0.0) * slope,
                                z_max)
                            z_o = jnp.minimum(
                                sz + (j + 1.0 - sig0) * slope, z_max)
                            seg = jnp.maximum(
                                ct_cs(z_i, row_k, row_k1)
                                - ct_cs(z_o, row_k, row_k1), 0.0)
                            return tau + seg / ddz

                        tau_f = jax.lax.fori_loop(0, k_this, m_body_cs,
                                                  z32)
                        # every scan completes (no iteration truncation);
                        # the TOA exit column is closed-form
                        act_f = jnp.zeros((blk, 128), jnp.bool_)
                        x_exit = sx + ddx * (z_max - sz) / ddz
                        exf = jnp.mod((x_exit - x0) * inv_dx
                                      + jnp.sign(ddx) * np.float32(1e-4),
                                      nxf_cs)
                        ex_col = jnp.clip(exf.astype(jnp.int32),
                                          0, nx - 1) * ny
                    else:
                        march_body = (m_body_ct if mode_this == "colct"
                                      else m_body)
                        z32 = jnp.zeros((blk, 128), jnp.float32)
                        i32z = jnp.zeros((blk, 128), jnp.int32)
                        carry_m = (sx, sy, sz, z32,
                                   ev.astype(jnp.int32), i32z)
                        if pcfg.march_while:
                            # early-exit variant: stop as soon as every
                            # lane in the block exited (capped at k_this)
                            def w_cond(c):
                                return ((jnp.sum(c[1][4]) > 0)
                                        & (c[0] < k_this))

                            def w_body(c):
                                return (c[0] + 1, march_body(c[0], c[1]))

                            _, carry_m = jax.lax.while_loop(
                                w_cond, w_body, (jnp.int32(0), carry_m))
                        else:
                            carry_m = jax.lax.fori_loop(
                                0, k_this, march_body, carry_m)
                        _, _, _, tau_f, act_fi, ex_col = carry_m
                        act_f = act_fi > 0
                    # lanes still marching after k_dda never exited: their
                    # contribution is dropped. Eligibility (dirs_mu_floor_ok)
                    # sizes k_dda so this set is empty; count any
                    # occurrences into nstat[0,6] so truncation is
                    # detectable rather than silent (folded into n_bad).
                    nstat_ref[0, 6] = nstat_ref[0, 6] + jnp.sum(
                        (ev & act_f).astype(jnp.float32))
                    hit = ev & ~act_f
                    if use_irr:
                        # Iwabuchi Eqs 13-14 on the marched tau: lanes
                        # the in-march tau_stop dropped have
                        # tau_f >= tau_stop, which zeroes every branch
                        # below, so the early exit changes nothing
                        # (reference: Integrators/
                        # monteCarloRadiativeTransfer.f95:1753-1813,
                        # transport.local_estimate for the XLA twin).
                        # u_i1/u_itf/tau_free/tau_max/small_c were drawn
                        # pre-march to size tau_stop.
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
                    if "noletally" in part_set:
                        # perf-bisection: skip the per-direction tally
                        # contraction (statistics wrong; timing only)
                        return
                    if "letallysum" in part_set:
                        # perf-bisection: no one-hot, no dot, static store
                        # (statistics wrong; isolates the reduction floor)
                        acci_ref[pl.ds(0, hti_pad)] = (
                            acci_ref[pl.ds(0, hti_pad)] + jnp.sum(contrib))
                        return
                    hi_e = jnp.right_shift(ex_col, 7)
                    lo_e = jnp.bitwise_and(ex_col, 127)
                    if "oldletally" in part_set:
                        # A/B control: the round-4 K-merged form. Its
                        # [blk, LANE, lo] one-hot build transposes the
                        # lane-resident lo index into the sublane dim
                        # (the known ~38-vs-11 us/step layout hazard the
                        # flux tally avoids); measured ~31 us/dir/step.
                        iota_lane_e = jax.lax.broadcasted_iota(
                            jnp.int32, (blk, 128, 128), 2)
                        ohs_e = (lo_e[:, :, None] == iota_lane_e).astype(
                            jnp.bfloat16)

                        def le_tally(v):
                            return _tally_contract(ohs_e, hi_e, v, None,
                                                   True, ht=hti_pad)
                    else:
                        # production: sublane-oriented scatter (photon
                        # index stays in the lane dim; same layout as the
                        # flux fast tally)
                        iota_sub_e = jax.lax.broadcasted_iota(
                            jnp.int32, (blk, 128, 128), 1)
                        ohs_e = (lo_e[:, None, :] == iota_sub_e).astype(
                            jnp.bfloat16)

                        def le_tally(v):
                            return _tally_contract_sub(ohs_e, hi_e, v,
                                                       hti_pad)
                    if "lestatictally" in part_set:
                        # perf-bisection: full one-hot + contraction but a
                        # STATIC accumulator row (isolates the dynamic
                        # pl.ds read-modify-write; statistics wrong)
                        iout = le_tally(contrib)
                        acci_ref[pl.ds(0, hti_pad)] = (
                            acci_ref[pl.ds(0, hti_pad)] + iout)
                        return
                    if pcfg.intensity_limit:
                        # cap the contribution; bank the clipped excess
                        # per (direction, component slot) and the image
                        # per slot -- the launch redistributes post-hoc
                        # (reference: Integrators/
                        # monteCarloRadiativeTransfer.f95:294-322,
                        # 1815-1826)
                        cap_c = np.float32(pcfg.max_contribution)
                        over = jnp.maximum(contrib - cap_c, 0.0)
                        contrib = jnp.minimum(contrib, cap_c)
                        iota_er = jax.lax.broadcasted_iota(
                            jnp.int32, (8, 128), 0)
                        iota_ed = jax.lax.broadcasted_iota(
                            jnp.int32, (8, 128), 1)
                        dmask = iota_ed == d_i
                        upd = jnp.zeros((8, 128), jnp.float32)
                        for c in range(n_comp + 1):
                            s_c = jnp.sum(
                                jnp.where(slot_ev == c, over, 0.0))
                            upd = upd + jnp.where(
                                (iota_er == c) & dmask, s_c, 0.0)
                        acce_ref[:] = acce_ref[:] + upd
                        for c in range(n_comp + 1):
                            contrib_c = jnp.where(slot_ev == c, contrib,
                                                  0.0)
                            iout = le_tally(contrib_c)
                            r0c = (c * n_dirs + d_i) * hti_pad
                            acci_ref[pl.ds(r0c, hti_pad)] = (
                                acci_ref[pl.ds(r0c, hti_pad)] + iout)
                    else:
                        iout = le_tally(contrib)
                        r0 = d_i * hti_pad
                        acci_ref[pl.ds(r0, hti_pad)] = (
                            acci_ref[pl.ds(r0, hti_pad)] + iout)

                if n_dirs <= 6:
                    # unrolled: small programs compile fastest in Mosaic,
                    # and each direction gets its own (much tighter)
                    # static march bound AND march formulation (steep
                    # directions cross few columns -> colct; shallow ones
                    # cross many -> the cheaper-per-iteration cell DDA)
                    for d_u in range(n_dirs):
                        if len(pcfg.k_dda_dirs) == n_dirs:
                            le_one_direction(d_u, pcfg.k_dda_dirs[d_u],
                                             march_dirs[d_u])
                        else:
                            le_one_direction(d_u,
                                             mode_this=march_dirs[d_u])
                else:
                    # many directions: fori over a traced direction index
                    # keeps the program size independent of n_dirs (the
                    # unrolled form blows up remote Mosaic compiles).
                    # Directions are pre-sorted into <= 4 groups, each
                    # with its own static bound + formulation, so shallow
                    # directions don't impose their march length on steep
                    # ones.
                    grps = (pcfg.dir_groups if pcfg.dir_groups
                            else ((march_dirs[0], k_dda, 0, n_dirs),))
                    for mode_g, k_g, s_g, c_g in grps:
                        def _dir_body(d_t, c_t, k_g=k_g, mode_g=mode_g):
                            le_one_direction(d_t, k_g, mode_g)
                            return c_t

                        jax.lax.fori_loop(s_g, s_g + c_g, _dir_body, 0)

            x_ref[sl], y_ref[sl], z_ref[sl] = x, y, z
            ux_ref[sl], uy_ref[sl], uz_ref[sl] = ux, uy, uz
            w_ref[sl] = w
            quota_ref[sl] = quota
            alive_ref[sl] = alive.astype(jnp.int32)
            bl_ref[sl] = bl

            # ---- fused tally ----
            # Per step a lane contributes at most ONE update: top exit,
            # bottom exit, or absorption at the collision cell (mutually
            # exclusive), so one factorized contract covers all three --
            # and it reuses the gather's lo one-hot (identical lo by
            # construction of oh_idx; only the hi rows differ).
            if en("tally"):
                t_val = jnp.where(exit_top, w,
                                  jnp.where(exit_bot, w_down, absorbed))
                t_val = jnp.where(exits | real, t_val, 0.0)
                if pcfg.flux_abs_2d:
                    # absorbed goes to a per-COLUMN section right after
                    # the flux rows (vol_base is 128-aligned): the
                    # accumulator shrinks from ~(2*nxy + nxyz)/128 rows
                    # to ~3*nxy/128, and with it the tally's dominant
                    # where-build cost. Needs its own lo one-hot (the
                    # gather's is keyed by the CELL).
                    t_idx2 = jnp.where(exits, t_exit, vol_base + col_c)
                    hi_t = jnp.right_shift(t_idx2, 7)
                    iota_sub_t2 = jax.lax.broadcasted_iota(
                        jnp.int32, (blk, 128, 128), 1)
                    ohs_tal = (jnp.bitwise_and(t_idx2, 127)[:, None, :]
                               == iota_sub_t2).astype(oh_dtype)
                else:
                    hi_t = jnp.where(exits, jnp.right_shift(t_exit, 7),
                                     vol_hi0 + jnp.right_shift(cell, 7))
                    ohs_tal = ohs_sub
                if (ohs_tal is not None and pcfg.bf16
                        and "oldtally" not in part_set):
                    # (bf16 only: the f32 pipeline keeps the 128-row
                    # j-major accumulator)
                    # Sublane tally (production default): reuses the
                    # sublane gather's one-hot -- per-sublane-row A.B^T
                    # dots contracted over the photon-lane dim
                    # (~11 us/step vs ~38 for the j-major layout).
                    ht_pad = -(-ht // 8) * 8
                    # value hi/lo splits STACKED along the sublane j axis
                    # (rows [0:ht) vh, [ht:2ht) vl): ONE dot per block row
                    # instead of two, so each row's lo one-hot streams
                    # through the MXU once. j folds to j % ht_pad with a
                    # single compare (no device mod, no i1 OR -- Mosaic
                    # hazards). c + (H + L) reassociates the old
                    # (c + H) + L -- within f32 rounding, not bitwise.
                    iota_j2t = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * ht_pad, 1, 1), 0)
                    jf_t = iota_j2t - np.int32(ht_pad) * (
                        iota_j2t >= ht_pad).astype(jnp.int32)
                    ohh_j2t = jf_t == hi_t[None, :, :]
                    vh_t, vl_t = _bf16_split(t_val)
                    zero_b = jnp.bfloat16(0)
                    vstk_t = jnp.where(iota_j2t < ht_pad,
                                       vh_t[None, :, :], vl_t[None, :, :])
                    a_s3 = jnp.where(ohh_j2t, vstk_t, zero_b)
                    dn_t = (((1,), (1,)), ((), ()))
                    contrib = acc_ref[:]
                    for b_i in range(blk):
                        t_2 = jax.lax.dot_general(
                            a_s3[:, b_i, :], ohs_tal[b_i], dn_t,
                            preferred_element_type=jnp.float32)
                        contrib = contrib + (t_2[:ht_pad] + t_2[ht_pad:])
                    acc_ref[:] = contrib
                else:
                    oh_lo_t = (oh_lo if oh_lo is not None
                               else _onehot_lo(oh_idx, iota_lane, oh_dtype))
                    acc_ref[:] = acc_ref[:] + _tally_contract(
                        oh_lo_t, hi_t, t_val, jmod_ref[:], pcfg.bf16, ht)
            if lw and atm_emit is not None and en("tally"):
                # LW emission pre-credit: each atmospheric emission
                # subtracts 1 from the volume-absorption tally at its
                # birth voxel (flux-divergence accounting; reference:
                # Integrators/monteCarloRadiativeTransfer.f95:504-508).
                # This is a lane's SECOND tally this step (it also moves),
                # so it gets its own sublane contraction; the value -1 is
                # bf16-exact, so a single dot per block row suffices.
                bc = jnp.where(atm_emit, birth_cell, 0)
                val_e = jnp.where(atm_emit, np.float32(-1.0), 0.0)
                lo_e2 = jnp.bitwise_and(bc, 127)
                iota_sub_t = jax.lax.broadcasted_iota(
                    jnp.int32, (blk, 128, 128), 1)
                ohs_e2 = (lo_e2[:, None, :] == iota_sub_t).astype(
                    jnp.bfloat16)
                hi_e2 = vol_hi0 + jnp.right_shift(bc, 7)
                ht_pad2 = -(-ht // 8) * 8
                iota_j2 = jax.lax.broadcasted_iota(
                    jnp.int32, (ht_pad2, 1, 1), 0)
                ohh_j2 = iota_j2 == hi_e2[None, :, :]
                a_e2 = jnp.where(ohh_j2, val_e.astype(jnp.bfloat16)[
                    None, :, :], jnp.bfloat16(0))
                dn_e2 = (((1,), (1,)), ((), ()))
                contrib_e = acc_ref[:]
                for b_i4 in range(blk):
                    contrib_e = contrib_e + jax.lax.dot_general(
                        a_e2[:, b_i4, :], ohs_e2[b_i4], dn_e2,
                        preferred_element_type=jnp.float32)
                acc_ref[:] = contrib_e
            if "stats" in part_set:  # event-profile instrumentation
                fsum = lambda m: jnp.sum(m.astype(jnp.float32))  # noqa: E731
                return (started, fsum(alive | exits | died_weight
                                      | died_surface),
                        fsum(real), fsum(exits), fsum(moved & clipped))
            return (started, None, None, None, None)

        started, s_act, s_real, s_exit, s_clip = block_step(
            b_idx, step0 + k_idx, jnp.float32(0.0))
        nstat_ref[0, 0] = nstat_ref[0, 0] + started
        if "stats" in part_set:
            nstat_ref[0, 2] = nstat_ref[0, 2] + s_act
            nstat_ref[0, 3] = nstat_ref[0, 3] + s_real
            nstat_ref[0, 4] = nstat_ref[0, 4] + s_exit
            nstat_ref[0, 5] = nstat_ref[0, 5] + s_clip

        # remaining-work count, accumulated block by block at the last step
        @pl.when(k_idx == k_steps - 1)
        def _count_work():
            sl = pl.ds(b_idx * blk, blk)
            work = jnp.sum(((alive_ref[sl] > 0)
                            | (quota_ref[sl] > 0)).astype(jnp.float32))
            nstat_ref[0, 1] = nstat_ref[0, 1] + work

    return kernel


def _pack_tables(domain: OpticalDomain, h_cells: int, rec_cols: int):
    """Pack cell records into the factorized-gather B matrix [128, W].

    B[lo, h*rec_cols + r] = record r of cell (h*128 + lo).

    Single component (rec_cols=4): (total extinction, ssa, f2, local
    majorant), f2 dual-use: HG asymmetry for analytic (all-HG) domains,
    the phase-function index for tabulated (inverse-CDF) domains.

    Multi-component (rec_cols=8, ncomp 2..3): (total extinction, local
    majorant, effective ssa = sum_c frac_c*ssa_c, cumulative scattering
    fractions cs_0 [, cs_1], f2 per component) where f2 is the component's
    HG g (analytic) or its GLOBAL stacked phase row offsets[c]+pfi_c
    (tabulated). See _build_kernel's scattering-coefficient formulation.
    """
    rec = domain.cell_records
    ncomp = domain.n_components
    n_cells = rec.shape[0]
    w_cols = h_cells * rec_cols
    if ncomp == 1:
        f2 = (rec[:, 2 + 3 * ncomp] if domain.all_hg
              else rec[:, 2 + 2 * ncomp])
        vals = jnp.stack([
            rec[:, 0],                 # beta
            rec[:, 2 + ncomp],         # ssa (component 0)
            f2,                        # hg g | phase index (component 0)
            rec[:, 1],                 # local (macro-block) majorant
        ], axis=1)  # [n_cells, rec_cols]
    else:
        cumf = rec[:, 2:2 + ncomp]  # fractional cumulative extinction
        ssa = rec[:, 2 + ncomp:2 + 2 * ncomp]
        pfi = rec[:, 2 + 2 * ncomp:2 + 3 * ncomp]
        gs = rec[:, 2 + 3 * ncomp:2 + 4 * ncomp]
        frac = jnp.diff(cumf, axis=1, prepend=0.0)  # extinction fractions
        scat = frac * ssa
        ssa_eff = jnp.sum(scat, axis=1)  # = sum_c frac_c * ssa_c
        cs = jnp.cumsum(scat, axis=1) / jnp.maximum(ssa_eff, 1e-30)[:, None]
        # pure absorbers (no scattering): component choice is moot (the
        # weight dies via ssa_eff = 0); select component 0
        cs = jnp.where(ssa_eff[:, None] > 0, cs, 1.0)
        if domain.all_hg:
            f2 = gs
        else:
            offs = domain.tables.offsets.astype(jnp.float32)
            f2 = pfi + offs[None, :]
        zcol = jnp.zeros((n_cells,), jnp.float32)
        vals = jnp.stack([
            rec[:, 0],                               # 0: beta
            rec[:, 1],                               # 1: local majorant
            ssa_eff,                                 # 2: effective ssa
            cs[:, 0],                                # 3: cs_0
            cs[:, 1] if ncomp == 3 else zcol,        # 4: cs_1
            f2[:, 0],                                # 5: f2 comp 0
            f2[:, 1],                                # 6: f2 comp 1
            f2[:, 2] if ncomp == 3 else zcol,        # 7: f2 comp 2
        ], axis=1)
    pad = h_cells * 128 - n_cells
    vals = jnp.pad(vals, ((0, pad), (0, 0)))
    # [h*128 + lo, r] -> B[lo, h*rec_cols + r]
    b = vals.reshape(h_cells, 128, rec_cols).transpose(1, 0, 2).reshape(
        128, w_cols)
    return b.astype(jnp.float32), w_cols


def _pack_forward_table(domain, use_hybrid: bool, n_s: int = 2048,
                        hif: bool = False):
    """Pack the forward (radiance) phase-value table for in-kernel lookup.

    The stored tables are uniform in ANGLE (reference:
    tabulateForwardPhaseFunctions, src/opticalProperties.f95:1872-1934),
    but Mosaic has no arccos; resampling each row onto a uniform
    s = sin(theta/2) grid makes the in-kernel index a single sqrt
    (s = sqrt((1 - cos)/2)), with resolution near the forward peak equal
    to the angle grid's (ds ~ dtheta/2 at theta ~ 0). Rows:
    [0:hf] v0_hi, [hf:2hf] v0_lo, [2hf:3hf] lerp delta, each an [hf, 128]
    (hi, lo) block of flat index row * n_s + k.
    Returns (packed [3*hf, 128] bf16, hf, n_s); with ``hif`` the
    hi-first layout instead: ([256, hf] f32 of (v0.T, delta.T) stacked
    on sublanes, hf, n_s) -- see _hif_gather2.
    """
    table = (domain.tables.forward if use_hybrid
             else domain.tables.forward_orig)  # [rows, n_angles]
    n_rows, n_ang = table.shape
    angles = jnp.linspace(0.0, np.pi, n_ang)
    s = jnp.linspace(0.0, 1.0, n_s)
    theta_s = 2.0 * jnp.arcsin(s)
    res = jax.vmap(lambda row: jnp.interp(theta_s, angles, row))(table)
    flat = res.reshape(-1)
    nxt = jnp.concatenate([flat[1:], flat[-1:]])
    delta = nxt - flat
    total = flat.size
    hf = -(-(-(-total // 128)) // 8) * 8

    def block(v):
        vp = jnp.pad(v, (0, hf * 128 - total))
        return vp.reshape(hf, 128)

    if hif:
        packed = jnp.concatenate(
            [block(flat).T, block(delta).T], axis=0).astype(jnp.float32)
        return packed, hf, n_s
    v_hi = block(flat).astype(jnp.bfloat16)
    v_lo = block(flat - v_hi.astype(jnp.float32).reshape(-1)[:total]
                 ).astype(jnp.bfloat16)
    d_b = block(delta).astype(jnp.bfloat16)
    return (jnp.concatenate([v_hi, v_lo, d_b], axis=0), hf, n_s)


def _pack_inverse_table(domain: OpticalDomain, hif: bool = False):
    """Pack the inverse-CDF angle table for in-kernel gathers.

    Paired layout over flat index i = row * n_steps + k:
    a0 = angle[i] split into bf16 hi/lo (angles need f32 accuracy -- the
    forward peak lives in the last few table bins), and the lerp DELTA
    angle[i+1] - angle[i] as a single bf16 (its bf16 relative error scales
    with the already-small step). Rows: [0:hp] a0_hi, [hp:2hp] a0_lo,
    [2hp:3hp] delta, each an [hp, 128] (hi, lo) block of the flat index.
    Returns (packed [3*hp, 128] bf16, hp, n_steps); with ``hif`` the
    hi-first layout instead: ([256, hp] f32 of (a0.T, delta.T) stacked on
    sublanes, hp, n_steps) -- exact f32, no hi/lo split (_hif_gather2).
    """
    inv = domain.tables.inverse  # [n_entries, n_steps] f32 angles
    n_entries, n_steps = inv.shape
    flat = inv.reshape(-1)
    nxt = jnp.concatenate([flat[1:], flat[-1:]])
    delta = nxt - flat
    total = flat.size
    hp = -(-(-(-total // 128)) // 8) * 8

    def block(v):
        vp = jnp.pad(v, (0, hp * 128 - total))
        return vp.reshape(hp, 128)

    if hif == "bf16":
        # hi-first bf16-split layout for _hif_gather2b: [384, hp] bf16
        fb = block(flat)
        f_hi = fb.astype(jnp.bfloat16)
        f_lo = (fb - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        packed = jnp.concatenate(
            [f_hi.T, f_lo.T, block(delta).astype(jnp.bfloat16).T], axis=0)
        return packed, hp, n_steps
    if hif:
        packed = jnp.concatenate(
            [block(flat).T, block(delta).T], axis=0).astype(jnp.float32)
        return packed, hp, n_steps
    a_hi = block(flat).astype(jnp.bfloat16)
    a_lo = block(flat - a_hi.astype(jnp.float32).reshape(-1)[:total]
                 ).astype(jnp.bfloat16)
    d_b = block(delta).astype(jnp.bfloat16)
    return (jnp.concatenate([a_hi, a_lo, d_b], axis=0), hp, n_steps)


def _pack_inverse_row(domain: OpticalDomain, row: int, hif: bool = False):
    """Single-row variant of _pack_inverse_table: pack ONE global stacked
    phase row (a template kernel's only scattering entry). Same paired
    (a0 hi/lo, delta) layout; returns (packed [3*hp, 128] bf16, hp,
    n_steps), or the hi-first ([256, hp] f32, hp, n_steps) with
    ``hif`` (_hif_gather2)."""
    inv = domain.tables.inverse[row]  # [n_steps] f32 angles
    n_steps = inv.shape[0]
    flat = inv.reshape(-1)
    nxt = jnp.concatenate([flat[1:], flat[-1:]])
    delta = nxt - flat
    hp = -(-(-(-n_steps // 128)) // 8) * 8

    def block(v):
        vp = jnp.pad(v, (0, hp * 128 - n_steps))
        return vp.reshape(hp, 128)

    if hif:
        packed = jnp.concatenate(
            [block(flat).T, block(delta).T], axis=0).astype(jnp.float32)
        return packed, hp, n_steps
    a_hi = block(flat).astype(jnp.bfloat16)
    a_lo = block(flat - a_hi.astype(jnp.float32).reshape(-1)[:n_steps]
                 ).astype(jnp.bfloat16)
    d_b = block(delta).astype(jnp.bfloat16)
    return (jnp.concatenate([a_hi, a_lo, d_b], axis=0), hp, n_steps)


def _obj_cache(obj, key, build):
    """Per-object memo for packed device tables.

    The packed tables (records, inverse CDF, forward phase, alias,
    march/CT) depend only on the domain/source arrays and a few static
    knobs -- NOT on the batch key -- yet the launcher used to rebuild
    them EAGERLY on every run_batch call. Through the axon relay each
    eager dispatch costs ~100 ms of latency, so a radiance batch paid
    more for table prep than for the kernel (measured: 1.4-2.9 s/batch
    of launcher overhead; the colct CT build alone was ~1.5 s/batch).
    Frozen dataclasses still carry __dict__, so object.__setattr__
    installs the memo without thawing them."""
    c = getattr(obj, "_pallas_table_cache", None)
    if c is None:
        c = {}
        object.__setattr__(obj, "_pallas_table_cache", c)
    if key not in c:
        c[key] = build()
    return c[key]


def run_batch_pallas(domain: OpticalDomain,
                     surface: Surface,
                     source: illumination.Source,
                     key: jax.Array,
                     pcfg: PallasConfig,
                     photons_per_lane: int,
                     n_photons=None,
                     use_russian_roulette: bool = True,
                     russian_roulette_weight: float = 1.0,
                     intensity_dirs=None,
                     lw_mode: bool = False):
    """Run one photon batch through the megakernel; returns raw tally parts.

    Returns (flux_up [nx,ny], flux_down [nx,ny], volume_absorption
    [nx,ny,nz], n_started i32, n_bad i32, n_calls i32); with
    pcfg.n_dirs > 0 an [nx, ny, n_dirs] raw intensity array is appended.
    """
    grid = domain.grid
    nx, ny, nz = grid.shape
    nxy, nxyz = nx * ny, nx * ny * nz
    rows = pcfg.rows
    n_lanes = pcfg.n_lanes

    h_cells = -(-nxyz // 128)
    vol_base = -(-2 * nxy // 128) * 128
    if pcfg.flux_abs_2d and (not pcfg.bf16
                             or "oldtally" in pcfg.debug_parts):
        raise ValueError("flux_abs_2d requires the bf16 sublane tally")
    ht = -(-(vol_base + (nxy if pcfg.flux_abs_2d else nxyz)) // 128)
    if ht > 128 and not pcfg.bf16:
        raise ValueError("domains beyond 16384 tally entries need the "
                         "bf16 pipeline (the f32 tally tiles hi mod ht "
                         "over 128 rows)")
    analytic_hg = bool(domain.all_hg)
    # hi-first big-table gathers (must match _build_kernel's `hif`/`hifb`,
    # which read the same debug_parts)
    _parts_hif = frozenset(pcfg.debug_parts.split(","))
    hif = "nohif" not in _parts_hif
    hif_inv = ("bf16" if hif and "bf16hif" in _parts_hif else hif)
    if analytic_hg:
        inv_packed = jnp.zeros((24, 128), jnp.bfloat16)
        inv_hp, inv_n_steps = 8, 0
    else:
        inv_packed, inv_hp, inv_n_steps = _obj_cache(
            domain, ("inv", hif_inv),
            lambda: _pack_inverse_table(domain, hif=hif_inv))
    # wide tables: shrink the block so the sublane gathers'
    # [blk, rows, 128] f32 transients stay a few MB. The WIDE hi-first
    # inverse fetch (_hif_gather2w, round 5) has no per-row transient --
    # its [256, blk*128] f32 output is 128 KB * blk -- so a big inverse
    # table alone only caps the block at 32 on that path.
    _wide_inv_ok = (hif and "bf16hif" not in _parts_hif
                    and "rowhif" not in _parts_hif)
    _blk_cap = (32 if (h_cells <= 128 and _wide_inv_ok) else 16)
    if (h_cells > 128 or inv_hp > 128) and pcfg.block_rows > _blk_cap:
        import dataclasses as _dc2
        pcfg = _dc2.replace(pcfg, block_rows=_blk_cap)
    ncomp = domain.n_components
    rec_cols = REC_COLS if ncomp == 1 else 8
    uniform_ssa = bool(ncomp == 1 and domain.uniform_ssa)
    uniform_hg = bool(ncomp == 1 and (
        domain.uniform_hg if analytic_hg
        else domain.tables.inverse.shape[0] == 1))
    # dynamic-gather resolution: engaged when the select-chain cost
    # (gathered fields x table rows, ~0.27 us per take_along_axis at 512
    # state rows) undercuts the one-hot MXU gather (~9 us/step). The
    # perf-bisection parts (g0..g4/oldgather) read b_hi in the one-hot
    # layout, so any of them forces the one-hot path.
    _parts_rb = frozenset(pcfg.debug_parts.split(","))
    n_gf = _dyn_gather_fields(ncomp, uniform_ssa, uniform_hg,
                              int(domain.macro_factor))
    use_dyn = (n_gf * h_cells <= _DYN_GATHER_MAX_OPS
               and not (_parts_rb & {"nodyn", "g0", "g1", "g2", "g4",
                                     "oldgather"}))
    if pcfg.dyn_gather != use_dyn:
        pcfg = dataclasses.replace(pcfg, dyn_gather=use_dyn)
    if (use_dyn and pcfg.n_dirs == 0 and analytic_hg
            and source.kind != illumination.EMISSION
            and pcfg.block_rows < 128 and pcfg.rows % 128 == 0):
        # without the gather one-hot, bigger blocks amortize the block
        # loop: blk=128 measured 103.6 vs 96.4 M photons/s at blk=64 on
        # the step-cloud headline (EXPERIMENTS_1e8.md round 4). Only for
        # analytic-HG non-emission configs (the measured shape): the
        # inverse-CDF / emission-alias gathers unroll per block row, so
        # re-raising blk past the wide-table cap would blow the program
        # (and, pre-hif, a [128, 3*hp, 128] transient) up 8x.
        pcfg = dataclasses.replace(pcfg, block_rows=128)

    def _build_b():
        b_tab, w_cols = _pack_tables(domain, h_cells, rec_cols)
        if pcfg.dyn_gather:
            # transposed f32 rows [w_pad, 128lo]: row h*rec_cols + r is
            # record field r of cells [h*128, (h+1)*128) -- gathered
            # per-lane, exact, no bf16 split
            w_pad = -(-w_cols // 8) * 8
            b_hi = jnp.pad(b_tab.T, ((0, w_pad - w_cols), (0, 0)))
            b_lo = jnp.zeros((8, 128), jnp.float32)
        elif pcfg.bf16:
            # bf16 hi/lo split of the record table (B = hi+lo to ~2^-17)
            b_hi = b_tab.astype(jnp.bfloat16)
            b_lo = (b_tab - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            b_hi, b_lo = b_tab, jnp.zeros_like(b_tab)
        return b_tab, b_hi, b_lo, w_cols

    b_tab, b_hi, b_lo, w_cols = _obj_cache(
        domain, ("btab", rec_cols, pcfg.bf16, pcfg.dyn_gather), _build_b)
    n_dirs = pcfg.n_dirs
    # forward (radiance) phase-value table for tabulated/hybrid local
    # estimation; analytic HG needs none
    use_fwd_table = n_dirs > 0 and pcfg.intensity_phase != "analytic"
    if use_fwd_table:
        _hyb = pcfg.intensity_phase == "hybrid"
        fwd_packed, fwd_hf, fwd_n_s = _obj_cache(
            domain, ("fwd", _hyb, hif),
            lambda: _pack_forward_table(domain, use_hybrid=_hyb, hif=hif))
        fwd_row_zero = bool(domain.all_hg)
    else:
        fwd_packed, fwd_hf, fwd_n_s = (
            jnp.zeros((24, 128), jnp.bfloat16), 8, 0)
        fwd_row_zero = True
    # Walker alias table for emission refills (bf16 hi/lo split rows:
    # prob_hi, prob_lo, alias_hi, alias_lo -- both reconstruct exactly)
    if source.kind == illumination.EMISSION:
        if source.em_prob is None:
            raise ValueError("emission source has no alias table (CDF was "
                             "traced at construction); megakernel needs "
                             "illumination.emission with concrete arrays")
        if not pcfg.bf16:
            raise ValueError("in-kernel emission requires the bf16 pipeline")
        ha = -(-h_cells // 8) * 8

        def _build_ea():
            def _blockify(vec):
                vp = jnp.pad(vec.astype(jnp.float32),
                             (0, ha * 128 - vec.shape[0]))
                return vp.reshape(ha, 128)

            pb = _blockify(source.em_prob)
            ab = _blockify(source.em_alias)
            if hif:
                # hi-first layout: [256, ha] f32 of (prob.T, alias.T)
                # stacked on sublanes -- exact, no bf16 split
                return jnp.concatenate([pb.T, ab.T], axis=0)
            pb_hi = pb.astype(jnp.bfloat16)
            pb_lo = (pb - pb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            ab_hi = ab.astype(jnp.bfloat16)
            ab_lo = (ab - ab_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.concatenate([pb_hi, pb_lo, ab_hi, ab_lo], axis=0)

        ea_packed = _obj_cache(source, ("ea", ha, hif), _build_ea)
    else:
        ha = 8
        ea_packed = jnp.zeros((4 * ha, 128), jnp.bfloat16)
    lw = bool(lw_mode) and source.kind == illumination.EMISSION
    # per-pixel Lambertian surface: pack the albedo grid per DOMAIN
    # column ([sa_rows, 128] f32; surface_px_ok guarantees each surface
    # pixel tiles whole columns, so nearest-neighbor replication is the
    # reference's fractional lookup exactly)
    surface_px = surface_px_ok(surface, grid, lw)
    if surface_px:
        def _build_sa():
            # jnp ops only: runs under trace when run_batch's jitted impl
            # dispatches here (surface.params is a tracer there)
            p = jnp.asarray(surface.params[:, :, 0], jnp.float32)
            nxs, nys = p.shape
            col = jnp.repeat(jnp.repeat(p, nx // nxs, axis=0),
                             ny // nys, axis=1)
            flat = col.reshape(-1)
            rows_sa = max(1, -(-nxy // 128))
            pad = rows_sa * 128 - nxy
            return jnp.pad(flat, (0, pad)).reshape(rows_sa, 128)

        sa_packed = _obj_cache(surface, ("sa", nx, ny), _build_sa)
        sa_rows = int(sa_packed.shape[0])
    else:
        sa_packed = jnp.zeros((8, 128), jnp.float32)
        sa_rows = 0
    hti_pad = -(-(-(-nxy // 128)) // 8) * 8  # ceil8(ceil(nxy / 128))
    # march table for in-kernel local estimation (bm_hi/bm_lo slots):
    # "colct" packs per-COLUMN cumulative vertical optical depth
    # CT[col, k] = sum_{j >= k} beta[col, j] * dz (row = col_hi*nzp + k,
    # lane = col_lo); "cell" packs per-cell beta (row = cell_hi)
    nzp = nz + 1
    if n_dirs > 0:
        m_dirs = (pcfg.march_dirs if len(pcfg.march_dirs) == n_dirs
                  else (pcfg.march_mode,) * n_dirs)
        need_ct = any(m == "colct" for m in m_dirs)
        need_cell = any(m not in ("colct", "colscan") for m in m_dirs)
        need_cs = any(m == "colscan" for m in m_dirs)
    else:
        m_dirs = ()
        need_ct = need_cell = need_cs = False
    # dynamic-gather CELL march: exact f32 beta rows gathered per-lane
    # per crossing (ships in the bm_lo slot); the colct block keeps the
    # one-hot contraction (4-point interpolation over the column block)
    use_dyn_march = (need_cell and h_cells <= _DYN_MARCH_MAX_ROWS
                     and not (_parts_rb & {"nodyn"}))
    if pcfg.dyn_march != use_dyn_march:
        pcfg = dataclasses.replace(pcfg, dyn_march=use_dyn_march)

    def _build_march():
        # Combined march table: colct 3-split block (rows [0, 3*hm_ct))
        # followed by the cell hi/lo block (rows
        # [3*hm_ct, 3*hm_ct + 2*hb_cell)); each in-kernel gather dots
        # only its own block, so unused rows cost VMEM, not MXU time.
        # With dyn_march the cell block instead ships as exact f32 rows
        # in a SEPARATE table (the bm_lo slot).
        parts = []
        hm_ct_b = hb_cell_b = 0
        if need_ct:
            hc_col = -(-nxy // 128)
            dz_v = (grid.z_edges[-1] - grid.z_edges[0]) / nz
            b2 = domain.cell_records[:, 0].reshape(nxy, nz)
            ct = jnp.concatenate(
                [jnp.cumsum(b2[:, ::-1], axis=1)[:, ::-1]
                 * jnp.asarray(dz_v, jnp.float32),
                 jnp.zeros((nxy, 1), jnp.float32)], axis=1)  # [nxy, nz+1]
            ctp = jnp.pad(ct, ((0, hc_col * 128 - nxy), (0, 0)))
            ct_tab = (ctp.reshape(hc_col, 128, nzp).transpose(0, 2, 1)
                      .reshape(hc_col * nzp, 128))
            hm_ct_b = -(-hc_col * nzp // 8) * 8
            ct_pad = jnp.pad(ct_tab,
                             ((0, hm_ct_b - hc_col * nzp), (0, 0)))
            # THREE stacked bf16 splits (CT magnitudes reach the column
            # total tau; segment differences need absolute accuracy
            # ~2^-27 * CT, beyond a 2-way split)
            s1 = ct_pad.astype(jnp.bfloat16)
            r1 = ct_pad - s1.astype(jnp.float32)
            s2 = r1.astype(jnp.bfloat16)
            s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
            parts += [s1, s2, s3]
        lo_parts = []
        cs_rows_b = 0
        if need_cs:
            # colscan z-profile table [2*nx rows, 128 lanes]: row 2c =
            # CT(col c, level 0..nz) and row 2c+1 the SHIFTED profile
            # CT(col c, level 1..nz), so the in-kernel linear interp is
            # two take_alongs of one dynamically-read row pair. ny == 1
            # by eligibility (nxy == nx); exact f32 (no bf16 split).
            dz_v = (grid.z_edges[-1] - grid.z_edges[0]) / nz
            b2c = domain.cell_records[:, 0].reshape(nxy, nz)
            ct_c = jnp.concatenate(
                [jnp.cumsum(b2c[:, ::-1], axis=1)[:, ::-1]
                 * jnp.asarray(dz_v, jnp.float32),
                 jnp.zeros((nxy, 1), jnp.float32)], axis=1)
            r0_c = jnp.pad(ct_c, ((0, 0), (0, 128 - nzp)))
            r1_c = jnp.pad(ct_c[:, 1:], ((0, 0), (0, 128 - nzp + 1)))
            cs_tab = jnp.stack([r0_c, r1_c], axis=1).reshape(
                2 * nxy, 128)
            cs_rows_b = -(-2 * nxy // 8) * 8
            lo_parts.append(jnp.pad(
                cs_tab, ((0, cs_rows_b - 2 * nxy), (0, 0))))
        if need_cell:
            hb_cell_b = -(-h_cells // 8) * 8
            # march beta table [hb, 128lo] (transposed, single field)
            bm_t = jnp.pad(b_tab[:, 0::rec_cols].T,
                           ((0, hb_cell_b - h_cells), (0, 0)))
            if pcfg.dyn_march:
                # exact f32 rows for the per-lane dynamic gather
                lo_parts.append(bm_t)
            else:
                # hi/lo bf16 splits stacked for a single folded dot
                mh_c = bm_t.astype(jnp.bfloat16)
                parts += [mh_c,
                          (bm_t - mh_c.astype(jnp.float32)).astype(
                              jnp.bfloat16)]
        if not parts:
            parts = [jnp.zeros((8, 128), jnp.bfloat16)]
        cell_f32 = (jnp.concatenate(lo_parts, axis=0) if lo_parts
                    else jnp.zeros((8, 128), jnp.float32))
        return (jnp.concatenate(parts, axis=0), cell_f32,
                hm_ct_b, hb_cell_b, cs_rows_b)

    if n_dirs > 0:
        if not pcfg.bf16:
            raise ValueError("in-kernel local estimation requires the "
                             "bf16 pipeline")
        dirs_a = jnp.asarray(intensity_dirs, jnp.float32)
        if len(pcfg.dir_perm) == n_dirs:
            # grouped fori path: the kernel marches directions in the
            # sorted order; the launch un-permutes the intensity output
            dirs_a = dirs_a[:, list(pcfg.dir_perm)]
        bm_hi, bm_lo, hm_ct, hb_cell, cs_rows = _obj_cache(
            domain, ("march", need_ct, need_cell, need_cs, rec_cols,
                     pcfg.dyn_march), _build_march)
        if not pcfg.dyn_march and not need_cs:
            bm_lo = jnp.zeros((8, 128), jnp.bfloat16)
    else:
        dirs_a = jnp.zeros((3, 1), jnp.float32)
        bm_hi = bm_lo = jnp.zeros((8, 128), jnp.bfloat16)
        hm_ct = hb_cell = cs_rows = 0

    # The quota-rebalance sums quotas in int32: the total must stay below
    # 2^31 or the sum wraps and zeroes every quota mid-run.
    if n_lanes * photons_per_lane >= 2 ** 31:
        raise ValueError(
            f"n_lanes*photons_per_lane = {n_lanes * photons_per_lane} "
            f"overflows the int32 quota budget; split into more batches")

    if source.kind in (illumination.DIRECTIONAL, illumination.RANDOM_AZIMUTH,
                       illumination.SPOTLIGHT):
        smu = source.solar_mu
        sphi = (source.solar_azimuth
                if source.kind != illumination.RANDOM_AZIMUTH else 0.0)
    else:
        smu, sphi = 0.0, 0.0
    atms_frac = (source.atms_fraction
                 if source.kind == illumination.EMISSION else 0.0)
    spot_x = (source.solar_x
              if source.kind == illumination.SPOTLIGHT else 0.0)
    spot_y = (source.solar_y
              if source.kind == illumination.SPOTLIGHT else 0.0)

    kb_kwargs = dict(
        uniform_ssa=uniform_ssa,
        uniform_hg=uniform_hg,
        macro_factor=int(domain.macro_factor),
        hti_pad=hti_pad, analytic_hg=analytic_hg,
        inv_hp=inv_hp, inv_n_steps=inv_n_steps,
        n_comp=ncomp, rec_cols=rec_cols,
        lw=lw, ha=ha, use_irr=pcfg.intensity_rr,
        use_fwd_table=use_fwd_table, fwd_hf=fwd_hf,
        fwd_n_s=fwd_n_s, fwd_row_zero=fwd_row_zero,
        hm_ct=hm_ct, hb_cell=hb_cell, nzp=nzp, cs_rows=cs_rows,
        brdf=("rpv" if surface.is_uniform_rpv
              else ("px" if surface_px else "lambertian")),
        sa_rows=sa_rows)
    # One jitted launch per static configuration: the kernel is a fresh
    # closure every _build_kernel call, so an uncached launch re-traces
    # the whole megakernel (plus the outer while_loop) EVERY batch --
    # measured 1.4-2.9 s of pure Python tracing per radiance batch, which
    # dwarfed the kernel runtime and was march-length-insensitive.
    lkey = ((nx, ny, nz), dataclasses.astuple(pcfg), source.kind,
            w_cols, h_cells, ht, bool(use_russian_roulette),
            tuple(sorted(kb_kwargs.items())), bool(domain.all_hg),
            n_photons is not None, photons_per_lane)
    launch = _LAUNCH_CACHE.get(lkey)
    if launch is not None:
        _LAUNCH_CACHE.move_to_end(lkey)
    else:
        kernel = _build_kernel((nx, ny, nz), pcfg, source.kind, w_cols,
                               h_cells, ht, use_russian_roulette,
                               **kb_kwargs)
        launch = jax.jit(_make_launch(
            kernel, pcfg, (nx, ny, nz), ht, hti_pad, photons_per_lane,
            n_photons is not None,
            idx_ssa=2 + ncomp,
            idx_f2=(2 + 3 * ncomp if domain.all_hg else 2 + 2 * ncomp),
            ncomp1=ncomp + 1))
        _LAUNCH_CACHE[lkey] = launch
        while len(_LAUNCH_CACHE) > _LAUNCH_CACHE_MAX:
            _LAUNCH_CACHE.popitem(last=False)

    n_ph_arg = 0 if n_photons is None else n_photons
    return launch(grid.x_edges, grid.y_edges, grid.z_edges,
                  domain.cell_records, surface.params,
                  domain.max_extinction, smu, sphi,
                  russian_roulette_weight, atms_frac, spot_x, spot_y,
                  dirs_a, b_hi, b_lo, bm_hi, bm_lo, inv_packed,
                  ea_packed, fwd_packed, sa_packed, key, n_ph_arg)


# Bounded LRU of jitted launches, keyed by the full static configuration
# (a long-lived process sweeping many domains/direction sets would
# otherwise accumulate compiled launches without eviction). Device TABLES
# are memoized separately on the domain/source objects themselves
# (object.__setattr__), so their lifetime is the object's own -- dropping
# the domain frees its packed device buffers.
_LAUNCH_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_LAUNCH_CACHE_MAX = 48


def _make_launch(kernel, pcfg: PallasConfig, shape, ht: int, hti_pad: int,
                 photons_per_lane: int, has_quota: bool,
                 idx_ssa: int, idx_f2: int, ncomp1: int = 2):
    """Build the whole-launch function run_batch_pallas jits and caches.

    Everything from params assembly through the relaunch while_loop and
    tally post-processing lives under ONE jit so a batch costs one
    dispatch. All device data arrives as arguments (tables come from the
    per-object cache, so the buffers -- and therefore the jit cache keys
    -- are stable across batches)."""
    nx, ny, nz = shape
    nxy, nxyz = nx * ny, nx * ny * nz
    rows, n_lanes, n_dirs = pcfg.rows, pcfg.n_lanes, pcfg.n_dirs
    vol_base = -(-2 * nxy // 128) * 128
    # [j, lo]: bf16 pipeline uses exactly ht rows (8-padded, j == hi);
    # the f32 pipeline tiles hi mod ht over 128 rows (legacy layout)
    ht_pad = (-(-ht // 8) * 8) if pcfg.bf16 else 128
    want_stats = "stats" in frozenset(pcfg.debug_parts.split(","))
    keys = ("x", "y", "z", "ux", "uy", "uz", "w", "quota", "alive",
            "beta_loc")
    n_state = len(keys)

    def launch(xe, ye, ze, records, surf_params, max_ext, smu, sphi,
               rr_weight, atms_frac, spot_x, spot_y, dirs_a,
               b_hi, b_lo, bm_hi, bm_lo, inv_packed, ea_packed,
               fwd_packed, sa_packed, key, n_ph_in):
        beta_max = jnp.maximum(jnp.asarray(max_ext, jnp.float32), _TINY)
        smu_f = jnp.asarray(smu, jnp.float32)
        sphi_f = jnp.asarray(sphi, jnp.float32)
        # DIRECTIONAL beam horizontal cosines (constants; refill reads
        # them instead of recomputing cos/sin/sqrt every step)
        sth = jnp.sqrt(jnp.maximum(0.0, 1.0 - smu_f ** 2))
        # surface params padded to 3: [albedo|rho0, k_rpv, theta_rpv]
        sp3 = jnp.pad(surf_params.reshape(-1).astype(jnp.float32),
                      (0, 3))[:3]
        params = jnp.stack([
            beta_max, 1.0 / beta_max,
            sp3[0],
            smu_f, sphi_f,
            jnp.asarray(rr_weight, jnp.float32),
            xe[0], xe[-1] - xe[0],
            ye[0], ye[-1] - ye[0],
            ze[0], ze[-1] - ze[0],
            # uniform-ssa / uniform-field2 scalars (field 2 = HG g for
            # analytic domains, phase index for tabulated ones)
            records[0, idx_ssa],
            records[0, idx_f2],
            sth * jnp.cos(sphi_f), sth * jnp.sin(sphi_f),
            # emission / spotlight / intensity-RR parameters
            jnp.asarray(atms_frac, jnp.float32),   # 16
            jnp.asarray(spot_x, jnp.float32),      # 17
            jnp.asarray(spot_y, jnp.float32),      # 18
            jnp.float32(pcfg.zeta_min),            # 19
            sp3[1], sp3[2],                        # 20/21: RPV k, theta
            jnp.float32(0.0), jnp.float32(0.0),
        ]).reshape(1, 24)
        jmod = jnp.asarray((np.arange(128) % ht)[None, :], jnp.int32)

        # per-lane quotas (clamped by the traced n_photons, like
        # run_batch)
        if has_quota:
            cap = n_lanes * photons_per_lane
            n_ph = jnp.minimum(jnp.asarray(n_ph_in, jnp.int32), cap)
            lane_i0 = (jnp.arange(rows, dtype=jnp.int32)[:, None] * 128
                       + jnp.arange(128, dtype=jnp.int32)[None, :])
            quota0 = (n_ph // n_lanes) + (
                lane_i0 < (n_ph % n_lanes)).astype(jnp.int32)
        else:
            quota0 = jnp.full((rows, 128), photons_per_lane, jnp.int32)

        # in-kernel seed: fold the batch key down to one uint32
        kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
        seed = (kd[0] * np.uint32(0x9E37_79B9) ^ kd[-1]).astype(jnp.int32)

        f32z = jnp.zeros((rows, 128), jnp.float32)
        state0 = dict(
            x=f32z, y=f32z, z=f32z, ux=f32z, uy=f32z,
            uz=jnp.ones((rows, 128), jnp.float32), w=f32z,
            quota=quota0, alive=jnp.zeros((rows, 128), jnp.int32),
            beta_loc=jnp.full((rows, 128), jnp.float32(1.0)) * beta_max,
        )
        acc0 = jnp.zeros((ht_pad, 128), jnp.float32)
        # with intensity_limit the radiance accumulator carries one image
        # SECTION per component slot (surface/emission + components) for
        # the post-hoc excess redistribution
        acci_secs = ncomp1 if pcfg.intensity_limit else 1
        acci0 = jnp.zeros((max(8, n_dirs * hti_pad * acci_secs), 128),
                          jnp.float32)
        acce0 = jnp.zeros((8, 128), jnp.float32)

        # grid = (steps, blocks): the kernel body is one block-step;
        # every buffer is a full array (constant index), so it is fetched
        # into VMEM once, stays resident across all grid steps, and is
        # written back once.
        grid_spec = pl.GridSpec(
            grid=(pcfg.steps_per_call, rows // pcfg.block_rows),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]  # dirs
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 3 + 9),
            out_specs=(
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 3)
                + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        )
        state_shapes = [
            jax.ShapeDtypeStruct((rows, 128),
                                 jnp.int32 if k in ("quota", "alive")
                                 else jnp.float32)
            for k in keys]
        out_shape = state_shapes + [
            jax.ShapeDtypeStruct((ht_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct(acci0.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ]
        # alias state + acc inputs onto outputs (in-place VMEM residency)
        aliases = {3 + i: i for i in range(n_state)}
        aliases[3 + n_state + 9] = n_state       # acc
        aliases[3 + n_state + 10] = n_state + 1  # acc_i
        aliases[3 + n_state + 11] = n_state + 2  # acc_e (capped excess)

        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=pcfg.interpret,
        )

        def cond(carry):
            (state, acc, acci, acce, n_started, n_calls, work,
             stat_acc) = carry
            return work & (n_calls * pcfg.steps_per_call < pcfg.max_steps)

        def body(carry):
            (state, acc, acci, acce, n_started, n_calls, work,
             stat_acc) = carry
            scal = jnp.stack([seed, n_calls * pcfg.steps_per_call]).astype(
                jnp.int32)
            outs = call(scal, params, dirs_a, *[state[k] for k in keys],
                        b_hi, b_lo, bm_hi, bm_lo, inv_packed, ea_packed,
                        fwd_packed, sa_packed, jmod, acc, acci, acce)
            new_state = dict(zip(keys, outs[:n_state]))
            acc = outs[n_state]
            acci = outs[n_state + 1]
            acce = outs[n_state + 2]
            stats = outs[n_state + 3]
            n_started = n_started + stats[0, 0].astype(jnp.int32)
            work = stats[0, 1] > 0
            # Rebalance unspent quota evenly across lanes between
            # launches: lanes that finish their photons early would
            # otherwise idle while stragglers' lanes hold unstarted work.
            # Any lane may run any photon (RNG streams are keyed by
            # (lane, step), so moving a photon to another lane just
            # selects a different, equally independent stream); the total
            # photon count is preserved.
            q = new_state["quota"]
            total_q = jnp.sum(q)
            lane_i = (jnp.arange(rows, dtype=jnp.int32)[:, None] * 128
                      + jnp.arange(128, dtype=jnp.int32)[None, :])
            new_state["quota"] = (total_q // n_lanes) + (
                lane_i < (total_q % n_lanes)).astype(jnp.int32)
            return (new_state, acc, acci, acce, n_started, n_calls + 1,
                    work, stat_acc + stats[0])

        carry = (state0, acc0, acci0, acce0, jnp.int32(0), jnp.int32(0),
                 jnp.bool_(True), jnp.zeros((8,), jnp.float32))
        (state_f, acc_f, acci_f, acce_f, n_started, n_calls, _,
         stat_acc) = jax.lax.while_loop(cond, body, carry)

        flat = acc_f[:ht].reshape(-1)  # rows j < ht hold acc[h]
        flux_up = flat[:nxy].reshape(nx, ny)
        flux_down = flat[nxy:2 * nxy].reshape(nx, ny)
        if pcfg.flux_abs_2d:
            # per-column absorbed section (no volume tally was kept)
            vol = flat[vol_base:vol_base + nxy].reshape(nx, ny)
        else:
            vol = flat[vol_base:vol_base + nxyz].reshape(nx, ny, nz)
        # n_bad: photons still alive at the step cap, plus any truncated
        # radiance marches (stat 6; empty when dirs_mu_floor_ok held)
        n_bad = (jnp.sum(state_f["alive"], dtype=jnp.int32)
                 + stat_acc[6].astype(jnp.int32))
        base = (flux_up, flux_down, vol, n_started, n_bad, n_calls)
        if n_dirs > 0:
            # un-permute back to the caller's direction order when the
            # grouped fori path sorted the directions (dir_perm[j] is the
            # ORIGINAL index marched as sorted index j)
            if len(pcfg.dir_perm) == n_dirs:
                order = [0] * n_dirs
                for j, orig in enumerate(pcfg.dir_perm):
                    order[orig] = j
            else:
                order = list(range(n_dirs))
            if pcfg.intensity_limit:
                # per-slot images + banked excess -> cap redistribution
                # (same math as transport.local_estimate.
                # redistribute_excess; reference:
                # Integrators/monteCarloRadiativeTransfer.f95:294-322)
                ibc = jnp.stack([
                    jnp.stack([
                        acci_f[(c * n_dirs + d) * hti_pad:
                               (c * n_dirs + d + 1) * hti_pad]
                        .reshape(-1)[:nxy] for d in order], axis=0)
                    for c in range(ncomp1)])       # [ncomp1, n_dirs, nxy]
                exc = jnp.stack(
                    [acce_f[:ncomp1, d] for d in order],
                    axis=0)                        # [n_dirs, ncomp1]
                sums = jnp.sum(ibc, axis=2)
                weightings = ibc / jnp.maximum(sums[:, :, None], 1e-30)
                add = jnp.einsum("cdp,dc->dp", weightings, exc)
                img = jnp.sum(ibc, axis=0) + add   # [n_dirs, nxy]
                intensity = jnp.moveaxis(
                    img.reshape(n_dirs, nx, ny), 0, -1)
            else:
                intensity = jnp.stack(
                    [acci_f[d * hti_pad:(d + 1) * hti_pad]
                     .reshape(-1)[:nxy].reshape(nx, ny) for d in order],
                    axis=-1)
            base = base + (intensity,)
        if want_stats:
            return base + (stat_acc,)
        return base

    return launch


def config_for(n_lanes: int, photons_per_lane: int, max_steps: int,
               interpret: bool = False) -> tuple:
    """Map a KernelConfig-shaped request onto megakernel launch geometry.

    Lane counts above 65536 fold into per-lane quota (the VMEM-resident
    wave is capped at 512 rows); the returned photons_per_lane keeps
    rows * 128 * ppl >= n_lanes * photons_per_lane so the traced n_photons
    clamp preserves the requested batch size exactly.
    """
    total = n_lanes * photons_per_lane
    rows = max(8, min(512, n_lanes // 128))
    ppl = -(-total // (rows * 128))
    blk = min(64, rows)
    while rows % blk:
        blk //= 2
    return PallasConfig(rows=rows, block_rows=blk,
                        max_steps=max_steps, interpret=interpret), ppl


def dda_iteration_bound(grid, min_mu: float) -> int:
    """Static march-length bound: face crossings from the domain bottom to
    the top along the shallowest admissible direction (mu >= min_mu),
    plus margin. Uses concrete grid edges when available; inside jit
    (edges traced) it assumes cells are no taller than wide (dz <= dx --
    true for atmospheric grids, whose cells are much wider than tall)."""
    nx, ny, nz = grid.shape
    mu = max(min_mu, 1e-3)
    sin_max = float(np.sqrt(max(0.0, 1.0 - mu * mu)))
    try:
        lz, dxc, dyc = _grid_march_scalars(grid)
        return int(np.ceil(nz + lz / mu * sin_max / min(dxc, dyc))) + 8
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return int(np.ceil(nz * (1.0 + sin_max / mu))) + 8


def colct_iteration_bound(grid, min_mu: float) -> int:
    """Static march bound for the "colct" (column-crossing) march: only
    horizontal face crossings take an iteration, so the bound is the
    horizontal extent of the shallowest admissible path (mu >= min_mu)
    in cells, plus the final in-column segment and margin."""
    nx, ny, nz = grid.shape
    mu = max(min_mu, 1e-3)
    sin_max = float(np.sqrt(max(0.0, 1.0 - mu * mu)))
    try:
        lz, dxc, dyc = _grid_march_scalars(grid)
        horiz = lz / mu * sin_max
        return int(np.ceil(horiz / dxc) + np.ceil(horiz / dyc)) + 6
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        # dz <= dx assumption as above: horizontal extent <= nz*sin/mu
        # cells per axis
        return 2 * int(np.ceil(nz * sin_max / mu)) + 6


def _grid_march_scalars(grid) -> tuple:
    """(lz, dxc, dyc) as PYTHON floats, fetched from the grid's edge
    arrays ONCE and memoized on the grid object.

    The edges live on the DEVICE; through the axon relay every scalar
    index-and-float costs a ~20 ms round trip. plan_march evaluates the
    bound for every (direction, formulation) pair -- at 64 directions the
    unmemoized fetches cost ~20 s of pure host dispatch PER BATCH (the
    round-4 radiance throughput collapse: 6.3k vs 164k photons/s with
    identical compiled code)."""
    memo = getattr(grid, "_march_scalar_memo", None)
    if memo is not None:
        return memo
    nx, ny, nz = grid.shape
    xe, ye, ze = grid.edges_np()
    memo = (float(ze[-1] - ze[0]), float(xe[-1] - xe[0]) / nx,
            float(ye[-1] - ye[0]) / ny)
    try:
        object.__setattr__(grid, "_march_scalar_memo", memo)
    except (AttributeError, TypeError):
        pass
    return memo


def march_bound_for_dir(grid, ux, uy, uz, mode: str) -> int:
    """Exact static march bound for ONE concrete direction: crossings it
    can actually make, per axis, skipping singleton axes (whose wrap
    re-enters the same column)."""
    nx, ny, nz = grid.shape
    uzf = max(float(uz), 1e-3)
    lz, dxc, dyc = _grid_march_scalars(grid)
    cx = int(np.ceil(lz * abs(float(ux)) / uzf / dxc)) + 1
    cy = int(np.ceil(lz * abs(float(uy)) / uzf / dyc)) + 1
    if mode == "colscan":
        # closed-form column scan (ny == 1 by eligibility): nx columns
        # x W wraps, W = wraps of the unwrapped column span (U + 1 cells)
        u_cols = lz * abs(float(ux)) / uzf / dxc
        return nx * (int((u_cols + 1.0) // nx) + 1)
    if mode == "colct":
        # singleton axes are skipped by the colct march (the wrap
        # re-enters the same column); the cell march still crosses them
        return (cx if nx > 1 else 0) + (cy if ny > 1 else 0) + 4
    return nz + cx + cy + 6


def plan_march(grid, icfg, dirs):
    """Host-side march plan: per-direction formulation + static bound.

    MUST be called OUTSIDE jit on concrete grid edges and direction
    cosines (run_batch does this next to the dirs_mu floor check and
    threads the result through as a static argument -- inside the jitted
    impl the dirs are tracers and nothing per-direction can be decided).
    Returns ((mode, ...), (k, ...), k_max) or None when anything is
    traced; callers fall back to the reference-shaped "cell" march with
    the loose min-mu bound.
    """
    if icfg is None or dirs is None:
        return None
    march_req = getattr(icfg, "pallas_march", "auto")
    nx_, ny_, nz_ = grid.shape
    # per-iteration cost model (TPU-measured on the step cloud:
    # ~1.4 + 0.04*rows in relative units): the colct iteration pays a
    # taller dot + the 4-row interpolation reduce over
    # hm_ct ~ ceil(nxy/128)*(nz+1) rows; the cell iteration reduces over
    # hb_cell ~ ceil(nxyz/128) rows
    hm_rows = -(- (-(-nx_ * ny_ // 128)) * (nz_ + 1) // 8) * 8
    hb_rows = -(-(-(-nx_ * ny_ * nz_ // 128)) // 8) * 8
    w_ct = 1.4 + 0.04 * hm_rows
    # the cell march's beta fetch is a per-lane dynamic gather when the
    # table fits the row-chain budget (4x cheaper than the one-hot dot,
    # EXPERIMENTS_1e8.md round 4) -- mirror run_batch_pallas' resolver
    h_cells_pm = -(-nx_ * ny_ * nz_ // 128)
    w_cell = (1.4 + 0.01 * hb_rows
              if h_cells_pm <= _DYN_MARCH_MAX_ROWS
              else 1.4 + 0.04 * hb_rows)

    # closed-form column scan: ny == 1 only (the crossing sequence along
    # x is closed-form in the continuous column coordinate), z-profile
    # rows need nz+1 <= 128 lanes and 2*nx VMEM rows. Its iteration is a
    # dynamic row read + take_alongs, probe-measured ~25x cheaper than a
    # colct one-hot crossing (tools/probe_tally.py round 4), but it has
    # no early exit and always runs nx*W iterations.
    cs_ok = (ny_ == 1 and nz_ + 1 <= 128 and nx_ <= 512)
    w_cs = 0.12
    _KIDX = {"cell": 0, "colct": 1, "colscan": 2}
    _W = {"cell": w_cell, "colct": w_ct, "colscan": w_cs}

    def _cost(m, kb3):
        return kb3[_KIDX[m]] * _W[m]

    def _pick(kb3):
        if march_req != "auto":
            if march_req == "colscan" and not cs_ok:
                return "cell"
            return march_req
        cands = ("cell", "colct") + (("colscan",) if cs_ok else ())
        return min(cands, key=lambda m: _cost(m, kb3))

    try:
        d_np = np.asarray(dirs)
        kb = [(march_bound_for_dir(grid, d_np[0, i], d_np[1, i],
                                   d_np[2, i], "cell"),
               march_bound_for_dir(grid, d_np[0, i], d_np[1, i],
                                   d_np[2, i], "colct"),
               march_bound_for_dir(grid, d_np[0, i], d_np[1, i],
                                   d_np[2, i], "colscan") if cs_ok else 0)
              for i in range(icfg.n_dirs)]
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return None
    if icfg.n_dirs <= 6:
        m_list = tuple(_pick(kb3) for kb3 in kb)
        k_list = tuple(kb3[_KIDX[m]] for kb3, m in zip(kb, m_list))
        return m_list, k_list, max(k_list), (), ()
    # fori path (> 6 directions): the march bound and formulation must be
    # STATIC inside each fori, so a single loop would pay the worst
    # direction's bound for every direction. Instead sort directions by
    # modeled cost, split into <= 4 contiguous GROUPS, and give each
    # group its own (formulation, bound) fori. The launcher permutes the
    # direction array and un-permutes the intensity output.
    m_all = tuple(_pick(kb3) for kb3 in kb)
    cost = [_cost(m, kb3) for kb3, m in zip(kb, m_all)]
    perm = tuple(sorted(range(icfg.n_dirs),
                        key=lambda i: (m_all[i], cost[i])))
    m_sorted = [m_all[i] for i in perm]
    k_sorted = [kb[i][_KIDX[m_all[i]]] for i in perm]
    groups = []
    start = 0
    n_groups = 4
    # greedy split: new group at formulation changes, then at the
    # largest bound jumps (each group runs at its max bound)
    splits = [i for i in range(1, icfg.n_dirs)
              if m_sorted[i] != m_sorted[i - 1]]
    jumps = sorted((k_sorted[i] - k_sorted[i - 1], i)
                   for i in range(1, icfg.n_dirs)
                   if i not in splits)
    for jmp, i in reversed(jumps):
        # a zero jump splits identical bounds: no iteration savings,
        # one more fori's fixed cost
        if len(splits) >= n_groups - 1 or jmp <= 0:
            break
        splits.append(i)
    for end in sorted(splits) + [icfg.n_dirs]:
        groups.append((m_sorted[start], max(k_sorted[start:end]),
                       start, end - start))
        start = end
    m_list = tuple(m_sorted)
    k_list = tuple(k_sorted)
    return m_list, k_list, max(k_list), tuple(groups), perm


def run_batch_pallas_tallies(domain, surface, source, key, config,
                             n_photons=None, interpret: bool = False,
                             intensity_config=None, intensity_dirs=None,
                             march_plan=None):
    """run_batch-compatible entry: returns a transport.integrator.Tallies.

    ``march_plan`` is plan_march's output, computed pre-jit by run_batch;
    direct callers with concrete dirs may omit it (recomputed here).
    """
    import dataclasses as _dc

    from mcbrat3d_tpu.transport.integrator import Tallies

    pcfg, ppl = config_for(config.n_lanes, config.photons_per_lane,
                           config.max_steps, interpret)
    if getattr(config, "pallas_debug_parts", "all") != "all":
        pcfg = dataclasses.replace(pcfg,
                                   debug_parts=config.pallas_debug_parts)
    if (not config.need_volume_absorption
            and not config.need_absorption_profile
            and not config.lw_mode and pcfg.bf16):
        # neither 3D absorption nor the profile is requested: tally
        # absorbed flux per COLUMN and skip the [nxyz] volume rows
        # (see PallasConfig.flux_abs_2d)
        pcfg = dataclasses.replace(pcfg, flux_abs_2d=True)
    if intensity_config is not None:
        # Radiance launch geometry: LE cost is per BLOCK-STEP (every live
        # block marches all directions every step), so lane OCCUPANCY
        # dominates -- a wide wave with tiny per-lane quota idles
        # thousands of lanes behind the last straggler photon while the
        # per-direction marches keep running. Trading wave width for
        # per-lane quota at equal batch size (rows 512 -> 32, ppl 2 -> 64)
        # measured 35.7k -> 115.4k photons/s at 64 directions and
        # 440k -> 922k at 6 (tools/exp_radiance.py, round 4).
        total_ph = config.n_lanes * config.photons_per_lane
        rows_i = min(pcfg.rows, 32)
        ppl = -(-total_ph // (rows_i * 128))
        pcfg = dataclasses.replace(pcfg, rows=rows_i,
                                   block_rows=min(rows_i, 32))
        icfg = intensity_config
        phase = ("hybrid" if icfg.use_hybrid_phase
                 else ("analytic" if domain.all_hg else "orig"))
        if march_plan is None:
            march_plan = plan_march(domain.grid, icfg, intensity_dirs)
        if march_plan is not None:
            m_list, k_list, k_max, groups, perm = march_plan
        else:
            # traced dirs: fall back to the reference-shaped cell march
            # with the loose min-mu bound (auto needs concrete cosines)
            march_req = getattr(icfg, "pallas_march", "auto")
            one = march_req if march_req != "auto" else "cell"
            m_list = (one,) * icfg.n_dirs
            bound = (colct_iteration_bound if one == "colct"
                     else dda_iteration_bound)
            k_list = ()
            k_max = bound(domain.grid, icfg.pallas_min_mu)
            groups = perm = ()
        pcfg = _dc.replace(
            pcfg, n_dirs=icfg.n_dirs,
            block_rows=min(pcfg.block_rows, 32),
            k_dda=k_max, k_dda_dirs=k_list,
            march_mode=m_list[0], march_dirs=m_list,
            dir_groups=groups, dir_perm=perm,
            intensity_rr=icfg.use_russian_roulette,
            # Iwabuchi RR stops most marches within a few optical depths
            # (in-march tau_stop), so the block-level early-exit while
            # loop pays for itself; the exact estimator always needs the
            # full tau and keeps the static fori
            march_while=bool(icfg.use_russian_roulette),
            zeta_min=icfg.zeta_min,
            intensity_phase=phase,
            intensity_limit=bool(icfg.limit_contributions),
            max_contribution=float(icfg.max_contribution))
    if n_photons is None:
        n_photons = config.photons_per_batch
    out = run_batch_pallas(
        domain, surface, source, key, pcfg, ppl, n_photons=n_photons,
        use_russian_roulette=config.use_russian_roulette,
        russian_roulette_weight=config.russian_roulette_weight,
        intensity_dirs=intensity_dirs,
        lw_mode=config.lw_mode)
    fu, fd, vol, n_started, n_bad, n_calls = out[:6]
    intensity = out[6] if pcfg.n_dirs > 0 else None
    if pcfg.flux_abs_2d:
        flux_absorbed, volume_absorption = vol, None
    else:
        flux_absorbed, volume_absorption = jnp.sum(vol, axis=2), vol
    return Tallies(
        flux_up=fu, flux_down=fd,
        flux_absorbed=flux_absorbed,
        volume_absorption=volume_absorption,
        intensity=intensity,
        n_photons=n_started, n_bad=n_bad,
        n_steps=n_calls * pcfg.steps_per_call,
    )
