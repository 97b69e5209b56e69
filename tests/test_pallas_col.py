"""Column-template megakernel tests (CPU interpreter mode).

The column kernel (transport/pallas_col.py) must match the XLA wave kernel
statistically on column-template domains -- same physics, different RNG
streams -- and its z-profile marginal must match the XLA kernel's 3D
volume-absorption field summed over columns.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
from mcbrat3d_tpu.physics.phase_function import (
    PhaseFunction,
    PhaseFunctionTable,
)
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport import pallas_col as pc
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.pallas_kernel import PallasConfig


def make_broken_cloud(nx=16, ny=16, nz=8, ssa=0.99, seed=0,
                      macro_factor=4, beta_scale=1.0, **build_kwargs):
    """Random column-template scene: broken cloud deck, per-column optical
    depth and top height (the Landsat shape;
    reference: Domain-Files/i3rcLandsatCloud.f95:82-90)."""
    rs = np.random.RandomState(seed)
    # spatially correlated cloud field (real Landsat scenes are patchy,
    # not per-column white noise -- and block majorants only help when
    # clear regions span whole blocks)
    f = rs.rand(nx, ny)
    for _ in range(3):
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    cloudy = f > np.quantile(f, 0.55)
    scale = rs.rand(nx, ny) * 0.05 * cloudy * beta_scale
    h = (np.ceil(f * nz).astype(int)) * (scale > 0)
    scale = scale * (h > 0)
    ext = np.zeros((nx, ny, nz))
    for k in range(nz):
        ext[:, :, k] = np.where(k < h, scale, 0.0)
    grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
    table = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    comp = OpticalComponent("broken cloud", ext, np.full_like(ext, ssa),
                            np.zeros(ext.shape, np.int32), table)
    build_kwargs.setdefault("n_cdf_steps", 201)
    return build_domain(grid, [comp], macro_factor=macro_factor,
                        **build_kwargs)


@pytest.fixture(scope="module")
def domain():
    return make_broken_cloud()


SMALL = PallasConfig(rows=8, block_rows=8, steps_per_call=16,
                     max_steps=4096, interpret=True)


class TestDetection:
    def test_broken_cloud_detected(self, domain):
        assert domain.col_template
        assert domain.col_scale.shape == (16 * 16,)
        assert domain.macro_table.shape == (16, 2)

    def test_non_template_not_detected(self):
        # a field with mid-column gaps is not column-templated
        nx, ny, nz = 4, 4, 6
        ext = np.zeros((nx, ny, nz))
        ext[:, :, 2:4] = 0.01  # elevated layer, zero below
        grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 32)], key=[1.0])
        comp = OpticalComponent("layer", ext, np.full_like(ext, 1.0),
                                np.zeros(ext.shape, np.int32), table)
        dom = build_domain(grid, [comp], n_cdf_steps=101)
        assert not dom.col_template

    def test_eligibility(self, domain):
        ok = pc.pallas_col_eligible(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=False)
        assert ok
        # 3D volume absorption is in-kernel up to MAX_VOL_CELLS
        assert pc.pallas_col_eligible(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=True)
        assert 16 * 16 * 8 <= pc.MAX_VOL_CELLS < 16384 * 129


class TestColTransport:
    def test_energy_conservation_no_rr(self, domain):
        out = pc.run_batch_pallas_col(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(0, 0), SMALL, 2, use_russian_roulette=False)
        fu, fd, ac, az, _vol, n, nbad, _ = out
        n = int(n)
        assert n == 8 * 128 * 2
        assert int(nbad) == 0
        bal = (float(fu.sum()) + 0.8 * float(fd.sum())
               + float(ac.sum())) / n
        assert bal == pytest.approx(1.0, abs=2e-3)
        # z marginal must equal the column-absorption total
        assert float(az.sum()) == pytest.approx(float(ac.sum()), rel=1e-4)

    def test_matches_xla_kernel_statistically(self, domain):
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                           max_steps=20_000, use_pallas="off")
        n_ph = cfg.photons_per_batch
        t = run_batch(domain, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(9, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = pc.run_batch_pallas_col(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(9, 1), pcfg, 64)
        fu, fd, ac, az, _vol, n, nbad, _ = out
        n = int(n)
        assert n == n_ph
        for a, b, name, p in (
                (fu, t.flux_up, "R", 0.4),
                (fd, t.flux_down, "T", 0.7),
                (ac, t.flux_absorbed, "A", 0.05)):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / int(t.n_photons)
            sigma = 2.0 * np.sqrt(max(p * (1 - p), 0.01) / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        # z profile vs the XLA kernel's volume field summed over columns
        prof_ref = np.asarray(t.volume_absorption).sum(axis=(0, 1)) \
            / int(t.n_photons)
        prof = np.asarray(az) / n
        np.testing.assert_allclose(prof, prof_ref, atol=4e-3)

    def test_volume_absorption_3d(self, domain):
        """The in-kernel 3D tally must reproduce the XLA kernel's
        volume-absorption field per cell (statistically) and agree
        EXACTLY with the kernel's own 2D column / z-profile marginals."""
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(domain, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(41, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = pc.run_batch_pallas_col(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(41, 1), pcfg, 64, need_vol=True)
        fu, fd, ac, az, vol, n, nbad, _ = out
        n = int(n)
        vol = np.asarray(vol)
        # internal consistency: marginals match the dedicated tallies
        # (same events, exact f32 values -- only summation order differs)
        np.testing.assert_allclose(vol.sum(axis=2), np.asarray(ac),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(vol.sum(axis=(0, 1)), np.asarray(az),
                                   rtol=1e-5, atol=1e-6)
        # statistical A/B vs the XLA kernel's per-cell field
        ref = np.asarray(t.volume_absorption) / int(t.n_photons)
        got = vol / n
        np.testing.assert_allclose(got, ref, atol=6e-4)
        assert np.corrcoef(got.reshape(-1), ref.reshape(-1))[0, 1] > 0.98

    def test_deterministic(self, domain):
        args = (domain, Surface.lambertian(0.2),
                illumination.directional(0.5, 0.0))
        a = pc.run_batch_pallas_col(*args, rng.batch_key(3, 5), SMALL, 2)
        b = pc.run_batch_pallas_col(*args, rng.batch_key(3, 5), SMALL, 2)
        c = pc.run_batch_pallas_col(*args, rng.batch_key(3, 6), SMALL, 2)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.any(np.asarray(a[0]) != np.asarray(c[0]))

    def test_tallies_wrapper(self, domain):
        cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2,
                           max_steps=4096,
                           need_volume_absorption=False)
        t = pc.run_batch_pallas_col_tallies(
            domain, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(0, 0), cfg, interpret=True)
        assert t.volume_absorption is None
        assert t.absorption_profile.shape == (8,)
        norm = t.normalized(domain.grid)
        assert norm.absorption_profile is not None
        assert int(t.n_photons) == cfg.photons_per_batch


def test_public_dispatch_use_pallas_on(domain=None):
    """run_batch routes col-template domains through the column kernel
    when use_pallas='on' (CPU: interpreter mode). The domain must exceed
    the small megakernel's 36864-cell envelope or the flux branch takes
    it first."""
    dom = make_broken_cloud(nx=64, ny=32, nz=32)
    cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2, max_steps=4096,
                       use_pallas="on", need_volume_absorption=False)
    t = run_batch(dom, Surface.lambertian(0.2),
                  illumination.directional(0.5, 0.0),
                  rng.batch_key(1, 0), cfg)
    assert t.volume_absorption is None  # the column-kernel signature
    assert t.absorption_profile is not None
    assert int(t.n_photons) == cfg.photons_per_batch


def test_use_pallas_on_rejects_uncovered_config():
    # ray-traced (non-Woodcock) stepping is outside every megakernel
    # (3D volume absorption, the old "uncovered" knob here, is in-kernel
    # now up to MAX_VOL_CELLS)
    dom = make_broken_cloud(nx=64, ny=32, nz=32)
    cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2, max_steps=4096,
                       use_pallas="on", use_ray_tracing=True)
    with pytest.raises(ValueError, match="megakernel"):
        run_batch(dom, Surface.lambertian(0.2),
                  illumination.directional(0.5, 0.0),
                  rng.batch_key(1, 0), cfg)


def _lw_broken_cloud(nx=16, ny=16, nz=8, ssa=0.6, lambda_um=10.0,
                     **kw):
    """Broken-cloud column-template scene with a lapse-rate temperature
    profile (z-uniform) so the col_em_* emission tables build."""
    z_c = (np.arange(nz) + 0.5) * 0.05  # km (dz = 50 m)
    tz = 288.0 - 6.5 * z_c
    temps = np.broadcast_to(tz, (nx, ny, nz)).copy()
    dom = make_broken_cloud(nx=nx, ny=ny, nz=nz, ssa=ssa, temps=temps,
                            lambda_um=lambda_um, **kw)
    return dom, temps


def _lw_source(dom, temps, emissivity=0.95):
    from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                               emission_weighting)
    kabs = np.asarray(dom.total_ext) * (1.0 - np.asarray(dom.ssa)[..., 0])
    w = emission_weighting(dom.grid, temps, kabs, 288.0, emissivity,
                           dom.lambda_um)
    return illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                 dom.grid.shape)


class TestColumnLWEmission:
    """In-kernel column-template BBEmission vs the XLA kernel's
    voxel-alias sampling: same emission density
    (1-ssa)*scale[col]*[z<h]*B(T(z)), same pre-credit accounting."""

    def test_emission_tables_built(self):
        dom, _ = _lw_broken_cloud()
        assert dom.col_em_prob is not None
        assert dom.col_em_fcum.shape == (8,)
        # h[alias[col]] really is the alias target's height
        al = np.asarray(dom.col_em_alias).astype(np.int64)
        h = np.asarray(dom.col_height)
        np.testing.assert_array_equal(np.asarray(dom.col_em_halias),
                                      h[al])

    def test_matches_xla_lw(self):
        dom, temps = _lw_broken_cloud()
        src = _lw_source(dom, temps)
        sfc = Surface.lambertian(0.05)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                           max_steps=20_000, use_pallas="off",
                           lw_mode=True)
        t = run_batch(dom, sfc, src, rng.batch_key(51, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = pc.run_batch_pallas_col(
            dom, sfc, src, rng.batch_key(51, 1), pcfg, 32,
            need_vol=True, lw_mode=True)
        fu, fd, ac, az, vol, n, nbad, _ = out
        n = int(n)
        assert n == 8 * 128 * 32
        assert int(nbad) == 0
        nx_ = int(t.n_photons)
        for a, b, name in ((fu, t.flux_up, "up"),
                           (fd, t.flux_down, "down")):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / nx_
            sigma = 2.0 * np.sqrt(0.25 / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        # NET column absorption (abs - emission pre-credits) vs the XLA
        # kernel's pre-credited volume field
        net_ref = float(np.asarray(t.volume_absorption).sum()) / nx_
        net = float(np.asarray(ac).sum()) / n
        sigma = 2.0 * np.sqrt(1.0 / n)
        assert net == pytest.approx(net_ref, abs=4 * sigma)
        # 3D NET field marginals agree with the dedicated tallies (the 2D
        # tally accumulates bf16 hi/lo VALUE splits, the 3D tally exact
        # f32 -- agreement is to the split's reconstruction error, ~1e-7
        # relative per contribution)
        vol = np.asarray(vol)
        np.testing.assert_allclose(vol.sum(axis=2), np.asarray(ac),
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(vol.sum(axis=(0, 1)), np.asarray(az),
                                   rtol=1e-4, atol=2e-3)

    def test_emission_spatial_distribution(self):
        """Optically thin all-atmosphere run: the net column field is
        ~(-1) x the emission column marginal, which is ANALYTIC:
        dens[col] proportional to scale[col] * Fcum[h[col]-1]."""
        # optically THIN (tau/cell ~ 0.02) so nearly every emitted photon
        # escapes and the net field is ~pure emission structure
        dom, temps = _lw_broken_cloud(ssa=0.3, beta_scale=0.02)
        src = _lw_source(dom, temps, emissivity=0.0)
        assert float(src.atms_fraction) == 1.0
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = pc.run_batch_pallas_col(
            dom, Surface.lambertian(0.05), src, rng.batch_key(61, 1),
            pcfg, 32, lw_mode=True)
        got = -np.asarray(out[2]).reshape(-1) / int(out[5])
        scale = np.asarray(dom.col_scale, np.float64)
        h = np.asarray(dom.col_height).astype(np.int64)
        fcum = np.asarray(dom.col_em_fcum, np.float64)
        dens = scale * np.where(h > 0, fcum[np.maximum(h - 1, 0)], 0.0)
        dens /= dens.sum()
        # only cloudy columns emit; correlation over all columns
        c = np.corrcoef(dens, got)[0, 1]
        assert c > 0.95, f"emission column-marginal correlation {c}"
        assert 0.7 * dens.sum() < got.sum() <= 1.001 * dens.sum()

    def test_dispatch_use_pallas_on(self):
        dom, temps = _lw_broken_cloud()
        src = _lw_source(dom, temps)
        cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2,
                           max_steps=4096, use_pallas="on", lw_mode=True,
                           need_volume_absorption=True)
        t = run_batch(dom, Surface.lambertian(0.05), src,
                      rng.batch_key(2, 0), cfg)
        assert t.volume_absorption is not None
        assert int(t.n_photons) == cfg.photons_per_batch


def _gas_broken_cloud(nx=16, ny=16, nz=8, ssa=0.99, gas_beta0=0.004,
                      seed=0, **build_kwargs):
    """Two-component column-template scene: broken cloud (varying
    heights) + horizontally uniform exponentially decaying pure-absorber
    gas (the broadband-SW per-bin shape over a Landsat cloud)."""
    rs = np.random.RandomState(seed)
    f = rs.rand(nx, ny)
    for _ in range(3):
        f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
    cloudy = f > np.quantile(f, 0.55)
    scale = rs.rand(nx, ny) * 0.05 * cloudy
    h = (np.ceil(f * nz).astype(int)) * (scale > 0)
    scale = scale * (h > 0)
    ext = np.zeros((nx, ny, nz))
    for k in range(nz):
        ext[:, :, k] = np.where(k < h, scale, 0.0)
    grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
    table = PhaseFunctionTable(
        [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
    cloud = OpticalComponent("broken cloud", ext,
                             np.full_like(ext, ssa),
                             np.zeros(ext.shape, np.int32), table)
    z_c = (np.arange(nz) + 0.5) * 0.05  # km
    q = gas_beta0 * np.exp(-z_c / 2.0)
    gas_ext = np.broadcast_to(q, (nx, ny, nz)).copy()
    gas = OpticalComponent("gas absorber", gas_ext,
                           np.zeros_like(gas_ext),
                           np.zeros(gas_ext.shape, np.int32),
                           PhaseFunctionTable(
                               [PhaseFunction.henyey_greenstein(0.0, 8)],
                               key=[1.0]))
    build_kwargs.setdefault("n_cdf_steps", 201)
    return build_domain(grid, [cloud, gas], macro_factor=4,
                        **build_kwargs)


class TestColumnGas:
    """Two-component column template: varying-height cloud + uniform
    pure-absorber gas stays on the column fast path (effective-ssa
    collisions, gas-aware 2-region majorant)."""

    def test_detected_and_eligible(self):
        dom = _gas_broken_cloud()
        assert dom.col_template and dom.col_qz is not None
        assert dom.n_components == 2
        np.testing.assert_allclose(
            float(dom.col_cloud[0]), 0.99, rtol=1e-6)
        assert pc.pallas_col_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=True)
        # LW emission with gas is NOT in the column kernel (the col_em
        # tables would miss the gas emission); it must fall elsewhere
        assert dom.col_em_prob is None

    def test_uniform_height_left_to_separable(self):
        """A broken cloud with ONE height + gas is the separable
        kernel's shape (which also covers its LW); the col detector must
        decline it."""
        nx, ny, nz = 8, 8, 8
        rs = np.random.RandomState(3)
        amp = (rs.rand(nx, ny) > 0.5) * 0.02
        ext = np.zeros((nx, ny, nz))
        ext[:, :, :4] = amp[:, :, None]
        grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 32)], key=[1.0])
        cloud = OpticalComponent("slab", ext, np.full_like(ext, 0.9),
                                 np.zeros(ext.shape, np.int32), table)
        gas_ext = np.full((nx, ny, nz), 0.002)
        gas = OpticalComponent("gas", gas_ext, np.zeros_like(gas_ext),
                               np.zeros(gas_ext.shape, np.int32),
                               PhaseFunctionTable(
                                   [PhaseFunction.henyey_greenstein(
                                       0.0, 8)], key=[1.0]))
        dom = build_domain(grid, [cloud, gas], macro_factor=4,
                           n_cdf_steps=101)
        assert not dom.col_template
        assert dom.sep_template

    def test_matches_xla(self):
        dom = _gas_broken_cloud()
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, sfc, src, rng.batch_key(9, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = pc.run_batch_pallas_col(dom, sfc, src, rng.batch_key(9, 1),
                                      pcfg, 64, need_vol=True)
        fu, fd, ac, az, vol, n, nbad, _ = out
        n = int(n)
        assert int(nbad) == 0
        # energy conservation (RR on, unbiased)
        bal = (float(fu.sum()) + 0.8 * float(fd.sum())
               + float(ac.sum())) / n
        assert bal == pytest.approx(1.0, abs=3e-3)
        for a, b, name, p in (
                (fu, t.flux_up, "R", 0.4),
                (fd, t.flux_down, "T", 0.7),
                (ac, t.flux_absorbed, "A", 0.1)):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / int(t.n_photons)
            sigma = 2.0 * np.sqrt(max(p * (1 - p), 0.01) / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        # absorption PROFILE discriminates the gas path (absorption in
        # clear air above/below the cloud comes only from the gas)
        prof_ref = np.asarray(t.volume_absorption).sum(axis=(0, 1)) \
            / int(t.n_photons)
        prof = np.asarray(az) / n
        np.testing.assert_allclose(prof, prof_ref, atol=6e-3)
        # 3D marginals consistent
        vol = np.asarray(vol)
        np.testing.assert_allclose(vol.sum(axis=2), np.asarray(ac),
                                   rtol=1e-4, atol=2e-3)


class TestColumnTabulatedPhase:
    """Single-entry tabulated (Mie-class) phase in the column megakernel:
    the reference Landsat configuration's shape (one Mie phase function for
    the whole scene; reference: Domain-Files/i3rcLandsatCloud.f95:27-40)."""

    def test_matches_xla(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        from mcbrat3d_tpu.transport import pallas_col as pc
        nx, ny, nz = 32, 32, 16
        rs = np.random.RandomState(1)
        f = rs.rand(nx, ny)
        for _ in range(2):
            f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
                 + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
        cloudy = f > np.quantile(f, 0.5)
        scale = rs.rand(nx, ny) * 0.06 * cloudy
        h = np.ceil(f * nz).astype(int) * (scale > 0)
        scale = scale * (h > 0)
        ext = np.zeros((nx, ny, nz))
        for k in range(nz):
            ext[:, :, k] = np.where(k < h, scale, 0.0)
        grid = Grid.regular(nx, ny, nz, 30.0, 30.0, 20.0)
        l = np.arange(1, 129, dtype=np.float64)
        mie_like = PhaseFunction(
            coefficients=0.75 * 0.85**l + 0.25 * 0.3**l)  # not HG
        tbl = PhaseFunctionTable([mie_like], key=[10.0])
        comp = OpticalComponent("mie cloud", ext, np.full_like(ext, 0.99),
                                np.zeros(ext.shape, np.int32), tbl)
        dom = build_domain(grid, [comp], macro_factor=8, n_cdf_steps=2001)
        assert not dom.all_hg and dom.col_template
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.2)
        assert pc.pallas_col_eligible(
            dom, sfc, src, lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=False)
        cfgP = KernelConfig(n_lanes=2048, photons_per_lane=8,
                            max_steps=20000, use_pallas="on",
                            tail_compaction=False,
                            need_volume_absorption=False)
        cfgX = KernelConfig(n_lanes=2048, photons_per_lane=8,
                            max_steps=20000, use_pallas="off",
                            tail_compaction=False)
        tP = run_batch(dom, sfc, src, rng.batch_key(0, 0), cfgP)
        tX = run_batch(dom, sfc, src, rng.batch_key(1, 0), cfgX)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        for aP, aX in ((tP.flux_up, tX.flux_up),
                       (tP.flux_down, tX.flux_down),
                       (tP.flux_absorbed, tX.flux_absorbed)):
            a = np.asarray(aP) / nP
            b = np.asarray(aX) / nX
            sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
            assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 5.0


class TestColIntensityInKernel:
    """In-kernel local estimation via the slab-scan march (the Landsat
    radiance configuration; reference: Drivers/monteCarloDriver.f95:61,
    Domain-Files/i3rcLandsatCloud.f95:27-40). Must match the XLA
    estimator statistically -- same physics, different RNG streams --
    across azimuth quadrants (the round-3 negative-direction-stall
    lesson: phi = 0 alone validates nothing)."""

    def _domain(self, **kw):
        kw.setdefault("compute_intensity_tables", True)
        kw.setdefault("hybrid_width_deg", 10.0)
        return make_broken_cloud(**kw)

    def _dirs8(self):
        from mcbrat3d_tpu.transport.local_estimate import (
            make_intensity_directions)
        mus = [1.0, 0.8, 0.6, 0.45, 0.8, 0.6, 0.45, 0.7]
        phis = [0.0, 45.0, 135.0, 180.0, 225.0, 270.0, 315.0, 90.0]
        return make_intensity_directions(mus, phis), mus, phis

    def test_eligibility_and_plan(self):
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        dom = self._domain()
        dirs, _, _ = self._dirs8()
        icfg = IntensityConfig(n_dirs=8, pallas_min_mu=0.4)
        ok = pc.pallas_col_intensity_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), False, 0, False,
            icfg, dirs, dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        assert ok, pc.col_intensity_ineligibility_reasons(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), False, 0, False,
            icfg, dirs, pk.dirs_mu_floor_ok(icfg, dirs), False)
        plan = pc.plan_col_march(dom.grid, dom, icfg, dirs)
        assert plan is not None
        a_list, k_list, groups, perm = plan
        assert len(a_list) == 8 and len(groups) <= 4
        assert sorted(perm) == list(range(8))
        # every direction's bound covers at least one full slab pass
        assert all(k >= 16 for k in k_list)
        # capping and emission are refused
        assert not pc.pallas_col_intensity_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), False, 0, False,
            IntensityConfig(n_dirs=8, limit_contributions=True), dirs,
            dirs_mu_ok=True)

    def _ab(self, dom, icfg, dirs, sfc_albedo=0.2, n_lanes=1 << 12,
            ppl=16, seed=11):
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        sfc = Surface.lambertian(sfc_albedo)
        src = illumination.directional(0.5, 30.0)
        cfgX = KernelConfig(n_lanes=n_lanes, photons_per_lane=ppl,
                            max_steps=20_000, use_pallas="off")
        tX = run_batch(dom, sfc, src, rng.batch_key(seed, 0), cfgX,
                       intensity_config=icfg, intensity_dirs=dirs)
        cfgC = KernelConfig(n_lanes=n_lanes, photons_per_lane=ppl,
                            max_steps=20_000)
        tC = pc.run_batch_pallas_col_tallies(
            dom, sfc, src, rng.batch_key(seed, 1), cfgC,
            interpret=True, intensity_config=icfg, intensity_dirs=dirs)
        assert tC.intensity is not None
        assert tC.intensity.shape == tX.intensity.shape
        assert int(tC.n_bad) == 0
        iX = np.asarray(tX.intensity) / int(tX.n_photons)
        iC = np.asarray(tC.intensity) / int(tC.n_photons)
        return iX, iC

    def test_matches_xla_azimuth_quadrants_production_default(self):
        """Iwabuchi RR + hybrid phase (the production default), 8
        directions spanning all azimuth quadrants."""
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        dom = self._domain()
        dirs, mus, phis = self._dirs8()
        icfg = IntensityConfig(n_dirs=8, use_russian_roulette=True,
                               use_hybrid_phase=True, pallas_min_mu=0.4)
        iX, iC = self._ab(dom, icfg, dirs)
        for d in range(8):
            a, b = iX[:, :, d].mean(), iC[:, :, d].mean()
            assert b == pytest.approx(a, rel=0.15), (
                f"dir {d} (mu {mus[d]}, phi {phis[d]}): xla {a} vs col {b}")
        assert iC.sum() == pytest.approx(iX.sum(), rel=0.05)

    def test_matches_xla_exact_estimator(self):
        """Exact (non-RR) estimator: per-pixel-capable comparison of the
        closed-form slab-scan tau against the XLA DDA march."""
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        dom = self._domain()
        dirs, mus, phis = self._dirs8()
        icfg = IntensityConfig(n_dirs=8, use_russian_roulette=False,
                               use_hybrid_phase=True, pallas_min_mu=0.4)
        iX, iC = self._ab(dom, icfg, dirs)
        for d in range(8):
            a, b = iX[:, :, d].mean(), iC[:, :, d].mean()
            assert b == pytest.approx(a, rel=0.15), (
                f"dir {d} (mu {mus[d]}, phi {phis[d]}): xla {a} vs col {b}")

    def test_matches_xla_with_gas(self):
        """2-component column template (cloud + uniform pure-absorber
        gas): the march's closed-form gas term."""
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        nx, ny, nz = 16, 16, 8
        dom0 = self._domain()
        # rebuild with a gas component (mirror make_broken_cloud's scene)
        rs = np.random.RandomState(0)
        f = rs.rand(nx, ny)
        for _ in range(3):
            f = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
                 + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
        cloudy = f > np.quantile(f, 0.55)
        scale = rs.rand(nx, ny) * 0.05 * cloudy
        h = (np.ceil(f * nz).astype(int)) * (scale > 0)
        scale = scale * (h > 0)
        ext = np.zeros((nx, ny, nz))
        for k in range(nz):
            ext[:, :, k] = np.where(k < h, scale, 0.0)
        grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
        comp_c = OpticalComponent("cloud", ext, np.full_like(ext, 0.99),
                                  np.zeros(ext.shape, np.int32), table)
        gas = np.full((1, 1, nz), 2e-4) * (1.0 + 0.5 * np.linspace(
            1.0, 0.0, nz))[None, None, :]
        comp_g = OpticalComponent(
            "gas", gas, np.zeros_like(gas), np.zeros(gas.shape, np.int32),
            PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0]))
        dom = build_domain(grid, [comp_c, comp_g], macro_factor=4,
                           n_cdf_steps=201, compute_intensity_tables=True,
                           hybrid_width_deg=10.0)
        assert dom.col_template and dom.col_qz is not None
        dirs, mus, phis = self._dirs8()
        icfg = IntensityConfig(n_dirs=8, use_russian_roulette=True,
                               use_hybrid_phase=True, pallas_min_mu=0.4)
        iX, iC = self._ab(dom, icfg, dirs)
        for d in range(8):
            a, b = iX[:, :, d].mean(), iC[:, :, d].mean()
            assert b == pytest.approx(a, rel=0.20), (
                f"dir {d} (mu {mus[d]}, phi {phis[d]}): xla {a} vs col {b}")
        assert iC.sum() == pytest.approx(iX.sum(), rel=0.06)

    def test_dispatch_big_domain_use_pallas_on(self):
        """A domain past the record kernel's cell envelope must reach the
        column kernel's radiance path through the public dispatch."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = self._domain(nx=64, ny=64, nz=16, macro_factor=8)
        assert 64 * 64 * 16 > 36864  # record-kernel MAX_CELLS
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 135.0])
        icfg = IntensityConfig(n_dirs=2, pallas_min_mu=0.4)
        cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2,
                           max_steps=4096, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(3, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        assert t.intensity is not None
        assert t.intensity.shape == (64, 64, 2)
        assert float(np.asarray(t.intensity).sum()) > 0


class TestColPerPixelSurface:
    """Per-pixel Lambertian albedo in the column kernel: the grid is
    packed per COLUMN (bf16 hi/lo split, ~1 ulp) and gathered with the
    shared event one-hots (reference fractional surface lookup:
    src/surfaceProperties.f95:119-147)."""

    def test_uniform_grid_bitwise_equals_scalar(self):
        """A 2x2 grid holding one bf16-exact value everywhere must
        reproduce the scalar-albedo arm bit for bit (same RNG streams,
        same physics)."""
        dom = make_broken_cloud()
        src = illumination.directional(0.5, 0.0)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                           max_steps=20_000)
        grid_sfc = Surface(params=np.full((2, 2, 1), 0.25, np.float32))
        t_px = pc.run_batch_pallas_col_tallies(
            dom, grid_sfc, src, rng.batch_key(7, 0), cfg, interpret=True)
        t_u = pc.run_batch_pallas_col_tallies(
            dom, Surface.lambertian(0.25), src, rng.batch_key(7, 0), cfg,
            interpret=True)
        assert int(t_px.n_photons) == int(t_u.n_photons)
        np.testing.assert_array_equal(np.asarray(t_px.flux_up),
                                      np.asarray(t_u.flux_up))
        np.testing.assert_array_equal(np.asarray(t_px.flux_down),
                                      np.asarray(t_u.flux_down))

    def test_varied_grid_matches_xla(self):
        """A 4x4 albedo pattern, A/B vs the XLA kernel statistically."""
        dom = make_broken_cloud()
        src = illumination.directional(0.5, 0.0)
        rs = np.random.RandomState(4)
        grid_sfc = Surface(
            params=(0.1 + 0.7 * rs.rand(4, 4, 1)).astype(np.float32))
        assert pc.pallas_col_eligible(
            dom, grid_sfc, src, lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=False)
        cfgX = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                            max_steps=20_000, use_pallas="off")
        tX = run_batch(dom, grid_sfc, src, rng.batch_key(9, 0), cfgX)
        cfgC = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                            max_steps=20_000)
        tC = pc.run_batch_pallas_col_tallies(
            dom, grid_sfc, src, rng.batch_key(9, 1), cfgC, interpret=True)
        nX, nC = int(tX.n_photons), int(tC.n_photons)
        rX = float(np.asarray(tX.flux_up).sum()) / nX
        rC = float(np.asarray(tC.flux_up).sum()) / nC
        sigma = 2.0 * np.sqrt(0.25 / nC)
        assert rC == pytest.approx(rX, abs=4 * sigma)
        # the reflected-flux pattern must track the albedo quadrants
        qX = np.asarray(tX.flux_up).reshape(4, 4, 4, 4).sum(axis=(1, 3))
        qC = np.asarray(tC.flux_up).reshape(4, 4, 4, 4).sum(axis=(1, 3))
        corr = np.corrcoef(qX.ravel() / nX, qC.ravel() / nC)[0, 1]
        assert corr > 0.9, (qX / nX, qC / nC)

    def test_radiance_with_px_surface_matches_xla(self):
        """Per-pixel albedo + in-kernel slab-scan radiance: the surface
        local-estimate term must carry the landing pixel's albedo."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_broken_cloud(compute_intensity_tables=True,
                                hybrid_width_deg=10.0)
        src = illumination.directional(0.5, 30.0)
        rs = np.random.RandomState(4)
        grid_sfc = Surface(
            params=(0.1 + 0.7 * rs.rand(4, 4, 1)).astype(np.float32))
        dirs = make_intensity_directions([1.0, 0.6, 0.6], [0.0, 135.0,
                                                           270.0])
        icfg = IntensityConfig(n_dirs=3, pallas_min_mu=0.4)
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        assert pc.pallas_col_intensity_eligible(
            dom, grid_sfc, src, False, 0, False, icfg, dirs,
            dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        cfgX = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                            max_steps=20_000, use_pallas="off")
        tX = run_batch(dom, grid_sfc, src, rng.batch_key(9, 0), cfgX,
                       intensity_config=icfg, intensity_dirs=dirs)
        cfgC = KernelConfig(n_lanes=1 << 12, photons_per_lane=16,
                            max_steps=20_000)
        tC = pc.run_batch_pallas_col_tallies(
            dom, grid_sfc, src, rng.batch_key(9, 1), cfgC, interpret=True,
            intensity_config=icfg, intensity_dirs=dirs)
        iX = np.asarray(tX.intensity) / int(tX.n_photons)
        iC = np.asarray(tC.intensity) / int(tC.n_photons)
        for d in range(3):
            assert iC[:, :, d].mean() == pytest.approx(
                iX[:, :, d].mean(), rel=0.15), d
