"""Tiled dense-domain megakernel tests (CPU interpreter mode).

The tiled kernel (transport/pallas_tile.py) is the general fast path for
dense NON-template 3D domains past the record-kernel envelope. It must be
statistically indistinguishable from the XLA wave kernel (same physics,
different RNG streams), conserve energy exactly without Russian roulette,
honor quotas and determinism, and dispatch from run_batch for the dense
configurations it covers. Small domains + force_tiles exercise the full
multi-tile sort/pack/crossing/empty-skip machinery cheaply on CPU.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                 PhaseFunctionTable)
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport import pallas_tile as pt
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch


def dense_domain(nx=16, ny=16, nz=8, seed=5, ssa=0.9, empty_half=False,
                 cell_ssa=False, tabulated=False):
    """Small dense broken-cloud field (non-template, non-separable)."""
    rs = np.random.RandomState(seed)
    beta = 0.08 * (0.3 + rs.rand(nx, ny, nz))
    zc = (np.arange(nz) + 0.5) / nz
    beta *= np.clip(1.5 * zc, 0.2, 1.0)[None, None, :]
    if empty_half:
        beta[nx // 2:] = 0.0  # a zero-extinction half: empty tiles
    grid = Grid.regular(nx, ny, nz, 12.0, 12.0, 4.0)
    if tabulated:  # Mie-class: a non-HG Legendre series
        mix = np.array([0.8 * 0.7 ** (m + 1) + 0.2 * 0.3 ** (m + 1)
                        for m in range(64)])
        tbl = PhaseFunctionTable([PhaseFunction(coefficients=mix)],
                                 key=[1.0])
    else:
        tbl = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    if cell_ssa:  # per-cell single-scattering albedo (MODIS/Mie class)
        ssa_f = np.clip(ssa - 0.3 * rs.rand(nx, ny, nz), 0.05, 1.0)
    else:
        ssa_f = np.full_like(beta, ssa)
    comp = OpticalComponent("dense", beta, ssa_f,
                            np.zeros(beta.shape, np.int32), tbl)
    return build_domain(grid, [comp], macro_factor=0, n_cdf_steps=201)


TCFG = pt.TileConfig(rows_b=4, k_steps=8, skip_iters=3, interpret=True,
                     force_tiles=(8, 8, 4),  # 2x2x2 = 8 tiles
                     drain_div=1 << 30)  # exact runs: no drain truncation


def run_tile(dom, sfc, src, key, n_lanes=2048, n_photons=None, rr=True,
             tcfg=TCFG):
    cfg = KernelConfig(n_lanes=n_lanes, photons_per_lane=4,
                       max_steps=100000, use_pallas="off",
                       need_volume_absorption=False,
                       use_russian_roulette=rr)
    return pt.run_batch_pallas_tile_tallies(
        dom, sfc, src, key, cfg, n_photons=n_photons, tcfg=tcfg)


class TestTileTransport:
    def test_plan_tiles(self):
        dom = dense_domain(16, 16, 8)
        plan = pt.plan_tiles(dom.grid)
        assert plan is not None
        tx, ty, tz = plan
        assert 16 % tx == 0 and 16 % ty == 0 and 8 % tz == 0
        assert tx * ty * tz <= pt.TILE_CELLS_MAX

    def test_eligibility(self):
        dom = dense_domain()
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        assert pt.pallas_tile_eligible(dom, sfc, src, False, False, 0,
                                       False, False, False)
        # each gate closes the envelope
        assert not pt.pallas_tile_eligible(dom, sfc, src, True, False, 0,
                                           False, False, False)
        assert not pt.pallas_tile_eligible(dom, sfc, src, False, True, 0,
                                           False, False, False)
        assert not pt.pallas_tile_eligible(dom, sfc, src, False, False, 0,
                                           False, True, False)
        r = pt.tile_ineligibility_reasons(dom, sfc, src, False, False, 0,
                                          True, False, False)
        assert r == ["use_ray_tracing"]

    def test_energy_conservation_no_rr(self):
        """Without roulette, every started photon's weight is fully
        tallied: R + (1 - rho) * T + A == 1 (the reference's accounting,
        Integrators/monteCarloRadiativeTransfer.f95:573-640,764-771)."""
        rho = 0.3
        dom = dense_domain(ssa=0.9)
        t = run_tile(dom, Surface.lambertian(rho),
                     illumination.directional(0.5, 0.0),
                     rng.batch_key(3, 0), n_photons=3000, rr=False)
        n = float(t.n_photons)
        assert int(t.n_photons) == 3000
        assert int(t.n_bad) == 0
        balance = float(np.asarray(t.flux_up).sum()
                        + (1 - rho) * np.asarray(t.flux_down).sum()
                        + np.asarray(t.flux_absorbed).sum()) / n
        assert abs(balance - 1.0) < 2e-4

    def test_matches_xla_kernel_statistically(self):
        """Domain-total and pixel fluxes agree with the XLA wave kernel
        within MC noise at equal photon counts (different streams)."""
        # a LARGE azimuth: the beam's horizontal displacement must show
        # up in the pixel pattern (catches dropped/mis-read azimuth --
        # a silent-getattr bug once zeroed it while tiny test azimuths
        # hid the difference)
        dom = dense_domain(ssa=0.95)
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.6, 137.0)
        n_t = 0
        fu_t = fd_t = ab_t = 0.0
        for b in range(2):
            t = run_tile(dom, sfc, src, rng.batch_key(0, b),
                         n_photons=6000)
            fu_t = fu_t + np.asarray(t.flux_up)
            fd_t = fd_t + np.asarray(t.flux_down)
            ab_t = ab_t + np.asarray(t.flux_absorbed)
            n_t += int(t.n_photons)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, src, rng.batch_key(9, 0), cfg)
        n_x = int(tx_.n_photons)
        for a, b_, nm in ((fu_t, np.asarray(tx_.flux_up), "up"),
                          (fd_t, np.asarray(tx_.flux_down), "down"),
                          (ab_t, np.asarray(tx_.flux_absorbed), "abs")):
            am, bm = a / n_t, b_ / n_x
            tot_a, tot_b = am.sum(), bm.sum()
            sig = np.sqrt(tot_a / n_t + tot_b / n_x + 1e-12)
            assert abs(tot_a - tot_b) < 5 * sig + 2e-3, (
                f"{nm}: {tot_a} vs {tot_b}")
            psig = np.sqrt(am / n_t + bm / n_x + 1e-12)
            assert np.all(np.abs(am - bm) < 6 * psig + 5e-3), nm

    def test_empty_tile_skip_matches_xla(self):
        """A half-empty domain exercises zero-majorant tiles, the
        in-step empty-skip chain and boundary parking; results must
        still match the XLA kernel."""
        dom = dense_domain(ssa=0.95, empty_half=True)
        sfc = Surface.lambertian(0.3)
        src = illumination.directional(0.5, 2.0)
        t = run_tile(dom, sfc, src, rng.batch_key(1, 0), n_photons=8000)
        n_t = int(t.n_photons)
        assert n_t == 8000
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, src, rng.batch_key(2, 0), cfg)
        n_x = int(tx_.n_photons)
        for a, b_, nm in ((t.flux_up, tx_.flux_up, "up"),
                          (t.flux_down, tx_.flux_down, "down"),
                          (t.flux_absorbed, tx_.flux_absorbed, "abs")):
            am = np.asarray(a) / n_t
            bm = np.asarray(b_) / n_x
            sig = np.sqrt(am.sum() / n_t + bm.sum() / n_x + 1e-12)
            assert abs(am.sum() - bm.sum()) < 5 * sig + 2e-3, nm
        # the clear half must transmit the direct beam: flux_down there
        # ~= 1 per column-normalized photon share
        fd = np.asarray(t.flux_down)
        assert fd[8:].sum() > 0.9 * (n_t // 2) * 0.9

    @pytest.mark.parametrize("ncomp", [2, 3])
    def test_multi_component_matches_xla(self, ncomp):
        """Dense multi-component domains (gas + cloud + Rayleigh, the
        production broadband-SW shape) run the scattering-coefficient
        chains: effective-ssa absorption + component selection against
        cumulative scattering fractions (reference:
        Integrators/monteCarloRadiativeTransfer.f95:759-771)."""
        nx, ny, nz = 16, 16, 8
        rs = np.random.RandomState(11)
        grid = Grid.regular(nx, ny, nz, 12.0, 12.0, 4.0)
        comps = []
        specs = [(0.05, 0.3, 0.0),    # absorbing gas, isotropic
                 (0.08, 0.99, 0.85),  # cloud, forward HG
                 (0.02, 1.0, 0.1)][:ncomp]  # Rayleigh-like
        for i, (b0, sa, g) in enumerate(specs):
            beta = b0 * (0.3 + rs.rand(nx, ny, nz))
            comps.append(OpticalComponent(
                f"c{i}", beta, np.full_like(beta, sa),
                np.zeros(beta.shape, np.int32),
                PhaseFunctionTable(
                    [PhaseFunction.henyey_greenstein(g, 64)],
                    key=[1.0])))
        dom = build_domain(grid, comps, macro_factor=0, n_cdf_steps=201)
        assert dom.n_components == ncomp
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.6, 137.0)
        t = run_tile(dom, sfc, src, rng.batch_key(12, 0),
                     n_photons=8000, rr=False)
        n_t = int(t.n_photons)
        assert int(t.n_bad) == 0
        balance = float(np.asarray(t.flux_up).sum()
                        + 0.8 * np.asarray(t.flux_down).sum()
                        + np.asarray(t.flux_absorbed).sum()) / n_t
        assert abs(balance - 1.0) < 2e-4
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, src, rng.batch_key(12, 1), cfg)
        n_x = int(tx_.n_photons)
        for a, b_, nm in ((t.flux_up, tx_.flux_up, "up"),
                          (t.flux_absorbed, tx_.flux_absorbed, "abs")):
            am = np.asarray(a) / n_t
            bm = np.asarray(b_) / n_x
            sig = np.sqrt(am.sum() / n_t + bm.sum() / n_x + 1e-12)
            assert abs(am.sum() - bm.sum()) < 5 * sig + 2e-3, nm

    def test_tabulated_phase_matches_xla(self):
        """Single-entry tabulated (Mie-class) phase runs the in-kernel
        inverse-CDF angle lookup; fluxes must match the XLA kernel and
        energy must close exactly without roulette."""
        dom = dense_domain(ssa=0.95, tabulated=True)
        assert not dom.all_hg
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.6, 137.0)
        t = run_tile(dom, sfc, src, rng.batch_key(5, 0), n_photons=8000,
                     rr=False)
        n_t = int(t.n_photons)
        assert int(t.n_bad) == 0
        balance = float(np.asarray(t.flux_up).sum()
                        + 0.8 * np.asarray(t.flux_down).sum()
                        + np.asarray(t.flux_absorbed).sum()) / n_t
        assert abs(balance - 1.0) < 2e-4
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, src, rng.batch_key(5, 1), cfg)
        n_x = int(tx_.n_photons)
        for a, b_, nm in ((t.flux_up, tx_.flux_up, "up"),
                          (t.flux_down, tx_.flux_down, "down")):
            am = np.asarray(a) / n_t
            bm = np.asarray(b_) / n_x
            sig = np.sqrt(am.sum() / n_t + bm.sum() / n_x + 1e-12)
            assert abs(am.sum() - bm.sum()) < 5 * sig + 2e-3, nm

    def test_per_cell_ssa_matches_xla(self):
        """Non-uniform single-scattering albedo (the MODIS/Mie class the
        tiled kernel exists for) runs the second slab block; absorbed and
        boundary fluxes must match the XLA kernel within MC noise, and
        energy must close exactly without roulette."""
        dom = dense_domain(ssa=0.9, cell_ssa=True)
        assert not dom.uniform_ssa
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.6, 137.0)
        t = run_tile(dom, sfc, src, rng.batch_key(2, 0), n_photons=8000,
                     rr=False)
        n_t = int(t.n_photons)
        assert int(t.n_bad) == 0
        balance = float(np.asarray(t.flux_up).sum()
                        + 0.8 * np.asarray(t.flux_down).sum()
                        + np.asarray(t.flux_absorbed).sum()) / n_t
        assert abs(balance - 1.0) < 2e-4
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, src, rng.batch_key(3, 0), cfg)
        n_x = int(tx_.n_photons)
        for a, b_, nm in ((t.flux_up, tx_.flux_up, "up"),
                          (t.flux_absorbed, tx_.flux_absorbed, "abs")):
            am = np.asarray(a) / n_t
            bm = np.asarray(b_) / n_x
            sig = np.sqrt(am.sum() / n_t + bm.sum() / n_x + 1e-12)
            assert abs(am.sum() - bm.sum()) < 5 * sig + 2e-3, nm

    def test_deterministic(self):
        dom = dense_domain()
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        t1 = run_tile(dom, sfc, src, rng.batch_key(7, 7), n_photons=2000)
        t2 = run_tile(dom, sfc, src, rng.batch_key(7, 7), n_photons=2000)
        assert np.array_equal(np.asarray(t1.flux_up),
                              np.asarray(t2.flux_up))
        assert np.array_equal(np.asarray(t1.flux_absorbed),
                              np.asarray(t2.flux_absorbed))

    def test_spotlight_and_random_azimuth_sources(self):
        """The remaining non-emission source kinds inject correctly:
        spotlight photons all enter one column (reference:
        src/monteCarloIllumination.f95:178-216); random-azimuth fluxes
        match the XLA kernel."""
        dom = dense_domain(ssa=0.9)
        sfc = Surface.lambertian(0.2)
        spot = illumination.spotlight(0.8, 0.0, 0.031, 0.031)
        t = run_tile(dom, sfc, spot, rng.batch_key(8, 0), n_photons=2000,
                     rr=False)
        n = int(t.n_photons)
        assert n == 2000 and int(t.n_bad) == 0
        balance = float(np.asarray(t.flux_up).sum()
                        + 0.8 * np.asarray(t.flux_down).sum()
                        + np.asarray(t.flux_absorbed).sum()) / n
        assert abs(balance - 1.0) < 2e-4
        # the slanted point beam produces a concentrated flux_down spot;
        # its location and share must match the XLA kernel
        fd = np.asarray(t.flux_down) / n
        cfg0 = KernelConfig(n_lanes=1 << 11, photons_per_lane=2,
                            max_steps=20000, tail_compaction=False,
                            use_pallas="off",
                            need_volume_absorption=False,
                            use_russian_roulette=False)
        ts = run_batch(dom, sfc, spot, rng.batch_key(9, 0), cfg0)
        fdx = np.asarray(ts.flux_down) / int(ts.n_photons)
        assert np.unravel_index(fd.argmax(), fd.shape) == \
            np.unravel_index(fdx.argmax(), fdx.shape)
        assert abs(fd.max() - fdx.max()) < 6 * np.sqrt(
            fd.max() / n + fdx.max() / int(ts.n_photons) + 1e-12) + 5e-3

        ra = illumination.random_azimuth(0.5)
        t2 = run_tile(dom, sfc, ra, rng.batch_key(8, 1), n_photons=6000)
        n2 = int(t2.n_photons)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20000, tail_compaction=False,
                           use_pallas="off",
                           need_volume_absorption=False)
        tx_ = run_batch(dom, sfc, ra, rng.batch_key(8, 2), cfg)
        n_x = int(tx_.n_photons)
        a = np.asarray(t2.flux_up).sum() / n2
        b = np.asarray(tx_.flux_up).sum() / n_x
        sig = np.sqrt(a / n2 + b / n_x + 1e-12)
        assert abs(a - b) < 5 * sig + 2e-3

    def test_guard_rows_b(self):
        """Launch shapes stay within the proven MAX_BLOCKS grid length
        (the Mosaic fault envelope: 320 blocks crashed the worker, 192
        ran clean) by automatic block widening."""
        # the config that faulted on hardware: pool 2^19, 64 tiles,
        # rows_b=16 -> 320 blocks; the guard must widen it
        assert pt.guard_rows_b(16, 1 << 19, 64) > 16
        for rows_b, pool, tiles in [(16, 1 << 18, 64), (16, 1 << 19, 64),
                                    (16, 1 << 20, 32), (8, 1 << 21, 16)]:
            rb = pt.guard_rows_b(rows_b, pool, tiles)
            B = rb * 128
            n_pool_r = -(-pool // B) * B
            assert (n_pool_r + tiles * B) // B <= pt.MAX_BLOCKS or rb >= 256

    def test_quota_exact(self):
        dom = dense_domain()
        t = run_tile(dom, Surface.lambertian(0.2),
                     illumination.flux(), rng.batch_key(4, 0),
                     n_photons=1234)
        assert int(t.n_photons) == 1234

    def test_drain_floor_truncates_and_reports(self):
        """With an aggressive drain floor the pass loop terminates early
        and the surviving straggler photons are counted in n_bad (the
        tiled analog of the reference's step cap + nBad,
        Integrators/monteCarloRadiativeTransfer.f95:562-563)."""
        import dataclasses
        dom = dense_domain(ssa=0.999)
        tcfg = dataclasses.replace(TCFG, drain_div=2)  # floor = pool/2
        t = run_tile(dom, Surface.lambertian(0.5),
                     illumination.directional(0.5, 0.0),
                     rng.batch_key(6, 0), n_lanes=1024, n_photons=4096,
                     tcfg=tcfg)
        assert int(t.n_photons) == 4096
        assert int(t.n_bad) > 0  # stragglers truncated at the floor
        # and the default config keeps truncation rare
        t2 = run_tile(dom, Surface.lambertian(0.5),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(6, 0), n_lanes=1024, n_photons=4096)
        assert int(t2.n_bad) <= 4096 // 50


class TestTileDispatch:
    def test_dense_overflow_routes_to_tile(self, monkeypatch):
        """A dense domain past the record envelope (> MAX_CELLS) with a
        tile-eligible configuration must dispatch to the tiled kernel
        when use_pallas='on'."""
        from mcbrat3d_tpu.transport import pallas_tile as _pt

        dom = dense_domain(40, 40, 24)  # 38400 cells > 36864
        called = {}

        def marker(*a, **k):
            called["hit"] = True
            raise RuntimeError("tile-dispatch-marker")

        monkeypatch.setattr(_pt, "run_batch_pallas_tile_tallies", marker)
        cfg = KernelConfig(n_lanes=512, photons_per_lane=1,
                           max_steps=100, use_pallas="on",
                           need_volume_absorption=False)
        with pytest.raises(RuntimeError, match="tile-dispatch-marker"):
            run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg)
        assert called.get("hit")

    def test_record_midsize_prefers_tile(self, monkeypatch):
        """16384 < cells <= MAX_CELLS used to hit the record kernel's
        one-hot cliff (0.405 M/s measured); tile-eligible configurations
        now route to the tiled kernel instead."""
        from mcbrat3d_tpu.transport import pallas_tile as _pt

        dom = dense_domain(32, 32, 18)  # 18432 cells, record-eligible

        def marker(*a, **k):
            raise RuntimeError("tile-dispatch-marker")

        monkeypatch.setattr(_pt, "run_batch_pallas_tile_tallies", marker)
        cfg = KernelConfig(n_lanes=512, photons_per_lane=1,
                           max_steps=100, use_pallas="on",
                           need_volume_absorption=False)
        with pytest.raises(RuntimeError, match="tile-dispatch-marker"):
            run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg)
