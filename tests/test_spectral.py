"""Spectral layer tests: weights, emission CDF, SSP tables, broadband runs."""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.core.planck import planck_radiance
from mcbrat3d_tpu.domain.common import CommonDomain, write_common, read_common
from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
from mcbrat3d_tpu.domain.ssp import (
    SSPComponent,
    SSPTable,
    components_from_ssp,
    read_ssp_table,
    write_ssp_table,
)
from mcbrat3d_tpu.physics.phase_function import PhaseFunction, PhaseFunctionTable
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.spectral.weights import (
    absorption_coefficient,
    emission_weighting,
    frequency_distribution,
    lambda_widths,
    solar_weighting,
)
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

C = 2.99792458e8


class TestWeights:
    def test_lambda_widths(self):
        lam = np.array([1.0, 2.0, 4.0, 5.0])
        np.testing.assert_allclose(lambda_widths(lam), [1.0, 1.5, 1.5, 1.0])

    def test_solar_weighting_uniform(self):
        lam = np.linspace(0.4, 0.7, 31)
        src = np.ones(31)
        cdf, total = solar_weighting(lam, src, solar_mu=0.5)
        assert cdf[-1] == pytest.approx(1.0)
        # endpoint bins get the full adjacent gap (reference convention),
        # so the integral is span + dLambda = 0.31
        assert total == pytest.approx(0.5 * 0.31, rel=1e-6)
        assert np.all(np.diff(cdf) >= 0)

    def test_frequency_distribution(self):
        cdf = np.array([0.25, 0.75, 1.0])
        freq = frequency_distribution(cdf, 100000, seed=0)
        assert freq.sum() == 100000
        np.testing.assert_allclose(freq / 1e5, [0.25, 0.5, 0.25], atol=0.01)
        np.testing.assert_array_equal(
            freq, frequency_distribution(cdf, 100000, seed=0))


def uniform_absorbing_components(grid, kabs, temp_field=None):
    nx, ny, nz = grid.shape
    ext = np.full((nx, ny, nz), kabs)
    table = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
    return [OpticalComponent(
        name="gray gas", extinction=ext,
        single_scattering_albedo=np.zeros_like(ext),
        phase_function_index=np.zeros(ext.shape, np.int32),
        phase_function_table=table)]


class TestEmissionWeighting:
    def test_voxel_cdf_and_split(self):
        grid = Grid.regular(2, 2, 4, 1.0, 1.0, 0.5)
        temps = np.full((2, 2, 4), 288.0)
        comps = uniform_absorbing_components(grid, kabs=2.0)
        kabs = absorption_coefficient(comps, grid)
        np.testing.assert_allclose(kabs, 2.0)
        w = emission_weighting(grid, temps, kabs, surface_temp=288.0,
                               surface_emissivity=1.0, lambda_um=10.0)
        assert w.voxel_cdf[-1] == pytest.approx(1.0)
        assert np.all(np.diff(w.voxel_cdf) >= -1e-12)
        # uniform medium: CDF is linear in flat index
        n = w.voxel_cdf.size
        np.testing.assert_allclose(w.voxel_cdf,
                                   np.arange(1, n + 1) / n, rtol=1e-9)
        # analytic power split: atm = 4 pi B kappa H, sfc = pi B
        b = planck_radiance(10.0, 288.0)
        expect_frac = (4 * 2.0 * 2.0) / (4 * 2.0 * 2.0 + 1.0)
        assert w.frac_atms_power == pytest.approx(expect_frac, rel=1e-6)
        assert w.flux == pytest.approx(np.pi * b * (1 + 16.0), rel=1e-6)

    def test_cold_surface_all_atmospheric(self):
        grid = Grid.regular(2, 2, 2, 1.0, 1.0, 1.0)
        temps = np.full((2, 2, 2), 250.0)
        kabs = np.full((2, 2, 2), 1.0)
        w = emission_weighting(grid, temps, kabs, surface_temp=0.0,
                               surface_emissivity=1.0, lambda_um=11.0)
        assert w.frac_atms_power == pytest.approx(1.0)


class TestLWTransport:
    def test_isothermal_blackbody_toa_flux(self):
        """Optically thick isothermal atmosphere + black surface at the same
        temperature: TOA upward flux must equal pi * B_lambda(T)."""
        T = 288.0
        lam = 10.0
        grid = Grid.regular(4, 4, 8, 0.25, 0.25, 0.25)
        temps = np.full((4, 4, 8), T)
        kabs_val = 6.0  # tau_abs = 12: effectively black
        comps = uniform_absorbing_components(grid, kabs=kabs_val)
        domain = build_domain(grid, comps, n_cdf_steps=101, temps=temps)
        kabs = absorption_coefficient(comps, grid)
        w = emission_weighting(grid, temps, kabs, surface_temp=T,
                               surface_emissivity=1.0, lambda_um=lam)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=16,
                           max_steps=4000, lw_mode=True)
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(0, 0), cfg)
        n = int(t.n_photons)
        up = float(np.sum(np.asarray(t.flux_up))) / n
        toa = up * w.flux
        expect = np.pi * planck_radiance(lam, T)
        # escape fraction is ~1/(1+4*tau), so relative MC noise is larger
        sigma = expect * np.sqrt(1.0 / (up * n))
        assert abs(toa - expect) < 4 * sigma + 0.01 * expect

    def test_lw_precredit_balances_isothermal(self):
        """In radiative equilibrium the net heating (absorbed - emitted,
        which the LW pre-credits encode) must vanish within noise."""
        T = 288.0
        grid = Grid.regular(2, 2, 4, 1.0, 1.0, 0.5)
        temps = np.full((2, 2, 4), T)
        comps = uniform_absorbing_components(grid, kabs=3.0)
        domain = build_domain(grid, comps, n_cdf_steps=101, temps=temps)
        kabs = absorption_coefficient(comps, grid)
        w = emission_weighting(grid, temps, kabs, surface_temp=T,
                               surface_emissivity=1.0, lambda_um=10.0)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=16,
                           max_steps=4000, lw_mode=True)
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(1, 0), cfg)
        n = int(t.n_photons)
        net = float(np.sum(np.asarray(t.volume_absorption))) / n
        # net absorbed-minus-emitted per photon should be ~ -escape fraction
        # of atmospheric photons; just require it is small and negative
        assert -0.2 < net < 0.005


class TestSSP:
    def _make_table(self):
        freq = C * 1e6 / np.array([0.5, 0.6])  # lambda = 0.5, 0.6 um
        g = [0.8, 0.7]
        coeffs = []
        starts = np.zeros((2, 2))
        lengths = np.zeros((2, 2))
        cmat = np.zeros((16, 2))
        for li in range(2):
            pos = 1
            for e in range(2):
                c = (g[e] + 0.05 * li) ** np.arange(1, 9)
                starts[e, li] = pos
                lengths[e, li] = 8
                cmat[pos - 1:pos + 7, li] = c
                pos += 8
        comp = SSPComponent(
            name="cloud water", ext_type="volExt",
            key=np.array([5.0, 15.0]),
            extinction=np.array([[3.0, 3.5], [1.5, 1.8]]),
            ssa=np.array([[0.99, 0.98], [0.97, 0.96]]),
            legendre_start=starts, legendre_length=lengths,
            legendre_coeffs=cmat)
        return SSPTable(freq_hz=freq, surface_albedo=np.array([0.1, 0.2]),
                        components=[comp])

    def test_roundtrip(self, tmp_path):
        tbl = self._make_table()
        path = str(tmp_path / "ssp.nc")
        write_ssp_table(path, tbl)
        back = read_ssp_table(path)
        np.testing.assert_allclose(back.lambdas_um, [0.5, 0.6], rtol=1e-9)
        np.testing.assert_allclose(back.surface_albedo, [0.1, 0.2])
        c = back.components[0]
        assert c.ext_type == "volExt"
        np.testing.assert_allclose(c.extinction, tbl.components[0].extinction)
        np.testing.assert_allclose(c.legendre_coeffs,
                                   tbl.components[0].legendre_coeffs,
                                   rtol=1e-6)

    def test_components_from_ssp_interpolation(self):
        tbl = self._make_table()
        grid = Grid.regular(2, 1, 2, 1.0, 1.0, 0.5)
        mass = np.full((1, 2, 1, 2), 0.5)
        reff = np.full((1, 2, 1, 2), 10.0)  # halfway between keys 5 and 15
        common = CommonDomain(grid=grid, temps=np.full((2, 1, 2), 280.0),
                              mass_conc=mass, reff=reff)
        comps, albedo, lam = components_from_ssp(common, [tbl], 0,
                                                 calc_rayleigh=False)
        assert lam == pytest.approx(0.5, rel=1e-9)
        assert albedo == pytest.approx(0.1)
        c = comps[0]
        # f = 0.5: ext = 0.5*(3.0+1.5)*mass
        np.testing.assert_allclose(c.extinction, 0.5 * (3.0 + 1.5) * 0.5,
                                   rtol=1e-6)
        np.testing.assert_allclose(c.single_scattering_albedo,
                                   0.5 * (0.99 + 0.97), rtol=1e-6)
        # f = 0.5 -> nearest phase function rounds up to entry 1
        assert np.all(c.phase_function_index == 1)

    def test_reff_out_of_range_raises(self):
        tbl = self._make_table()
        grid = Grid.regular(1, 1, 1, 1.0, 1.0, 1.0)
        common = CommonDomain(grid=grid, temps=np.full((1, 1, 1), 280.0),
                              mass_conc=np.full((1, 1, 1, 1), 0.5),
                              reff=np.full((1, 1, 1, 1), 99.0))
        with pytest.raises(ValueError, match="effective radius"):
            components_from_ssp(common, [tbl], 0, calc_rayleigh=False)


class TestCommonDomainIO:
    def test_roundtrip(self, tmp_path):
        grid = Grid.regular(2, 2, 3, 1.0, 1.0, 0.5)
        temps = 280.0 + np.arange(12).reshape(2, 2, 3)
        rho = np.full((2, 2, 3), 1.1)
        mass = np.random.RandomState(0).rand(1, 2, 2, 3)
        reff = 5.0 + 10 * np.random.RandomState(1).rand(1, 2, 2, 3)
        common = CommonDomain(grid=grid, temps=temps, rho=rho,
                              mass_conc=mass, reff=reff)
        path = str(tmp_path / "common.nc")
        pressure = np.array([900.0, 800.0, 700.0])
        write_common(path, common, pressure_hpa=pressure)
        back = read_common(path)
        np.testing.assert_allclose(back.temps, temps)
        np.testing.assert_allclose(back.mass_conc, mass, rtol=1e-12)
        np.testing.assert_allclose(back.reff, reff, rtol=1e-12)
        # numConc from ideal gas
        assert back.num_conc is not None
        expect = (900.0 * 100 * 6.02214076e23) / (8.31446261815324 * temps[0, 0, 0])
        assert back.num_conc[0, 0, 0] == pytest.approx(expect, rel=1e-9)


class TestBroadbandEndToEnd:
    def test_tallies_to_arrays_fast_path_layouts(self):
        """Accumulation must accept every tally layout: the record
        megakernel's flux_abs_2d path (volume_absorption=None, no
        profile) and the column path (z-marginal absorption_profile
        only). Regression: r4 hardware broadband crashed on
        np.asarray(None).mean."""
        import jax.numpy as jnp

        from mcbrat3d_tpu.spectral.broadband import _tallies_to_arrays
        from mcbrat3d_tpu.transport.integrator import Tallies

        f = jnp.ones((4, 4))
        base = dict(flux_up=f, flux_down=f, flux_absorbed=f,
                    n_photons=jnp.int32(16), n_bad=jnp.int32(0))
        flat = _tallies_to_arrays(Tallies(volume_absorption=None, **base))
        assert "volume_absorption" not in flat
        assert "absorption_profile" not in flat
        col = _tallies_to_arrays(Tallies(
            volume_absorption=None, absorption_profile=jnp.ones(5), **base))
        assert col["absorption_profile"].shape == (5,)
        full = _tallies_to_arrays(Tallies(
            volume_absorption=jnp.ones((4, 4, 5)), **base))
        assert full["absorption_profile"].shape == (5,)

    def test_sw_broadband_conserves(self, tmp_path):
        """Two-wavelength SW broadband run over a scattering slab: with a
        black surface, up+down per photon == 1, so scaled fluxes sum to the
        spectrally integrated incident flux."""
        from mcbrat3d_tpu.driver.config import SimulationConfig
        from mcbrat3d_tpu.spectral import solar as solar_io
        from mcbrat3d_tpu.spectral.broadband import run_broadband

        tbl = TestSSP._make_table(self)
        tbl.surface_albedo = np.array([0.0, 0.0])
        ssp_path = str(tmp_path / "ssp.nc")
        write_ssp_table(ssp_path, tbl)

        grid = Grid.regular(2, 2, 2, 1.0, 1.0, 0.5)
        common = CommonDomain(
            grid=grid, temps=np.full((2, 2, 2), 280.0),
            mass_conc=np.full((1, 2, 2, 2), 0.4),
            reff=np.full((1, 2, 2, 2), 10.0))
        common_path = str(tmp_path / "common.nc")
        write_common(common_path, common)

        solar_path = str(tmp_path / "solar.nc")
        solar_io.write_solar_source(solar_path, [0.5, 0.6], [100.0, 80.0])

        cfg = SimulationConfig(
            solar_mu=0.6, num_lambda=2, lw_flag=-1.0, calc_rayleigh=False,
            num_photons_per_batch=1 << 13, num_batches=4, iseed=3,
            n_phase_intervals=501, n_lanes=1 << 11, max_steps=3000,
            phys_domain_file=common_path, ssp_file_names=[ssp_path],
            solar_source_file=solar_path)
        res = run_broadband(cfg)
        assert res.total_photons == 4 * (1 << 13)
        # expected incident flux: mu0 * integral S dLambda (uniform widths .1)
        expect_flux = 0.6 * (100.0 + 80.0) * 0.1
        assert res.solar_flux == pytest.approx(expect_flux, rel=1e-6)
        total = (res.mean["mean_flux_up"] + res.mean["mean_flux_down"]
                 + res.mean["mean_flux_absorbed"])
        assert total == pytest.approx(expect_flux, rel=1e-3)

    def test_lw_broadband_runs(self, tmp_path):
        from mcbrat3d_tpu.driver.config import SimulationConfig
        from mcbrat3d_tpu.spectral.broadband import run_broadband

        tbl = TestSSP._make_table(self)
        tbl.surface_albedo = np.array([0.0, 0.0])
        ssp_path = str(tmp_path / "ssp.nc")
        write_ssp_table(ssp_path, tbl)

        grid = Grid.regular(2, 2, 2, 1.0, 1.0, 0.5)
        common = CommonDomain(
            grid=grid, temps=np.full((2, 2, 2), 288.0),
            mass_conc=np.full((1, 2, 2, 2), 0.4),
            reff=np.full((1, 2, 2, 2), 10.0))
        common_path = str(tmp_path / "common.nc")
        write_common(common_path, common)

        cfg = SimulationConfig(
            num_lambda=2, lw_flag=1.0, surface_temp=288.0,
            calc_rayleigh=False,
            num_photons_per_batch=1 << 12, num_batches=2, iseed=5,
            n_phase_intervals=501, n_lanes=1 << 10, max_steps=3000,
            phys_domain_file=common_path, ssp_file_names=[ssp_path])
        res = run_broadband(cfg)
        assert res.total_photons == 2 * (1 << 12)
        assert res.solar_flux > 0  # total emitted flux
        assert res.mean["mean_flux_up"] > 0


class TestLWRadiance:
    def test_isothermal_blackbody_radiance(self):
        """Optically thick isothermal scene: TOA radiance = B_lambda(T) in
        every direction (validates emission + scattering + surface local
        estimation together)."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        T, lam = 288.0, 10.0
        grid = Grid.regular(4, 4, 6, 0.25, 0.25, 0.25)
        temps = np.full((4, 4, 6), T)
        comps = uniform_absorbing_components(grid, kabs=8.0)
        domain = build_domain(grid, comps, n_cdf_steps=101, temps=temps,
                              compute_intensity_tables=True)
        kabs = absorption_coefficient(comps, grid)
        w = emission_weighting(grid, temps, kabs, surface_temp=T,
                               surface_emissivity=1.0, lambda_um=lam)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 120.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=True,
                               zeta_min=0.3)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8,
                           max_steps=4000, lw_mode=True)
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(2, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        t = t.normalized(grid)
        rad = np.asarray(t.intensity).mean(axis=(0, 1)) * w.flux
        expect = planck_radiance(lam, T)
        np.testing.assert_allclose(rad, expect, rtol=0.05)


class TestBroadbandCheckpointMesh:
    def _setup(self, tmp_path):
        from mcbrat3d_tpu.driver.config import SimulationConfig
        from mcbrat3d_tpu.spectral import solar as solar_io
        tbl = TestSSP._make_table(self)
        tbl.surface_albedo = np.array([0.0, 0.0])
        ssp_path = str(tmp_path / "ssp.nc")
        write_ssp_table(ssp_path, tbl)
        grid = Grid.regular(2, 2, 2, 1.0, 1.0, 0.5)
        common = CommonDomain(
            grid=grid, temps=np.full((2, 2, 2), 280.0),
            mass_conc=np.full((1, 2, 2, 2), 0.4),
            reff=np.full((1, 2, 2, 2), 10.0))
        common_path = str(tmp_path / "common.nc")
        write_common(common_path, common)
        solar_path = str(tmp_path / "solar.nc")
        solar_io.write_solar_source(solar_path, [0.5, 0.6], [100.0, 80.0])
        return SimulationConfig(
            solar_mu=0.6, num_lambda=2, lw_flag=-1.0, calc_rayleigh=False,
            num_photons_per_batch=1 << 12, num_batches=4, iseed=3,
            n_phase_intervals=501, n_lanes=1 << 9, max_steps=3000,
            checkpoint_every_batches=1,
            phys_domain_file=common_path, ssp_file_names=[ssp_path],
            solar_source_file=solar_path)

    def test_mesh_matches_serial_statistically(self, tmp_path):
        from mcbrat3d_tpu.spectral.broadband import run_broadband
        cfg = self._setup(tmp_path)
        r_serial = run_broadband(cfg)
        r_mesh = run_broadband(cfg, mesh="auto")
        assert r_mesh.total_photons == r_serial.total_photons
        # independent RNG streams: the difference is ~N(0, se_s^2+se_m^2)
        sigma = np.sqrt(r_serial.stderr["mean_flux_up"] ** 2
                        + r_mesh.stderr["mean_flux_up"] ** 2)
        diff = abs(r_mesh.mean["mean_flux_up"] - r_serial.mean["mean_flux_up"])
        assert diff < max(5.0 * sigma, 0.02 * r_serial.mean["mean_flux_up"])

    def test_checkpoint_resume_bitwise(self, tmp_path):
        from mcbrat3d_tpu.driver import checkpoint as ckpt
        from mcbrat3d_tpu.spectral.broadband import run_broadband
        cfg = self._setup(tmp_path)
        full = run_broadband(cfg, mesh="auto")
        saves = {}
        def cb(b, acc, chunk):
            p = str(tmp_path / f"ck{b}.npz")
            ckpt.save_checkpoint(p, b, acc, chunk)
            saves[b] = p
        run_broadband(cfg, mesh="auto", checkpoint_cb=cb)
        # resume from an intermediate checkpoint and match the full run
        b = sorted(saves)[len(saves) // 2]
        nb, acc, chunk = ckpt.load_checkpoint(saves[b], with_meta=True)
        resumed = run_broadband(cfg, mesh="auto", accumulator=acc,
                                start_batch=nb, resume_chunk_size=chunk)
        np.testing.assert_allclose(resumed.mean["flux_up"],
                                   full.mean["flux_up"], rtol=1e-12)

    def test_resume_wrong_chunk_rejected(self, tmp_path):
        from mcbrat3d_tpu.spectral.broadband import run_broadband
        cfg = self._setup(tmp_path)
        with pytest.raises(ValueError, match="chunk size"):
            run_broadband(cfg, mesh="auto", start_batch=2,
                          resume_chunk_size=12345)


class TestSSPWriterVariantTolerance:
    def test_reads_reference_writer_albedo_name(self, tmp_path):
        """The shipped reference tool writes 'SingleScatterAlbedoT' while
        the solver reads 'SingleScatteringAlbedoT' (SURVEY.md section 7);
        our reader accepts both spellings."""
        from scipy.io import netcdf_file
        path = str(tmp_path / "variant.nc")
        tbl = TestSSP._make_table(self)
        write_ssp_table(path, tbl)
        # rewrite the file with the writer-variant name
        with netcdf_file(path, "r", mmap=False) as nc:
            data = {k: (v.dimensions, np.array(v[:]))
                    for k, v in nc.variables.items()}
            dims = dict(nc.dimensions)
            attrs = {k: v for k, v in nc._attributes.items()}
        with netcdf_file(path, "w") as nc:
            for d, size in dims.items():
                nc.createDimension(d, size)
            for k, (vdims, arr) in data.items():
                name = k.replace("SingleScatteringAlbedoT",
                                 "SingleScatterAlbedoT")
                kind = np.dtype(arr.dtype).newbyteorder("=")
                dt = {"float32": "f4", "float64": "f8",
                      "int32": "i4"}[kind.name]
                nc.createVariable(name, dt, vdims)[:] = arr
            for k, v in attrs.items():
                setattr(nc, k, v)
        back = read_ssp_table(path)
        np.testing.assert_allclose(back.components[0].ssa,
                                   tbl.components[0].ssa)


class TestEmissionSourceStreams:
    def test_azimuth_independent_of_voxel_position(self):
        """The azimuth must use its own deviate: sub-voxel (x, y, z) offsets
        and phi must be uncorrelated (reference draws independent deviates
        per field; reference: src/monteCarloIllumination.f95:495-509)."""
        nx = ny = nz = 4
        n_vox = nx * ny * nz
        cdf = np.arange(1, n_vox + 1) / n_vox
        src = illumination.emission(cdf, atms_fraction=1.0,
                                    grid_shape=(nx, ny, nz))
        n = 100_000
        xf, yf, zf, mu, phi = illumination.sample(
            src, rng.batch_key(7, 0), n)
        xf, yf, zf = np.asarray(xf), np.asarray(yf), np.asarray(zf)
        phi = np.asarray(phi)
        mu = np.asarray(mu)
        for off in ((xf * nx) % 1.0, (yf * ny) % 1.0, (zf * nz) % 1.0, mu):
            r = np.corrcoef(off, phi)[0, 1]
            assert abs(r) < 4.0 / np.sqrt(n), r
        # and phi itself stays uniform on [0, 2 pi)
        h, _ = np.histogram(phi, bins=16, range=(0.0, 2 * np.pi))
        assert h.min() > 0.9 * n / 16 and h.max() < 1.1 * n / 16


class TestGasComponent3D:
    def _gas_table(self, nz, xsec_val=1e-25):
        freq = np.array([C / 10.0e-6])
        comp = SSPComponent(name="gray gas", ext_type="absXsec",
                            xsec=np.full((nz, 1), xsec_val))
        return SSPTable(freq_hz=freq, surface_albedo=np.array([0.0]),
                        components=[comp])

    def test_3d_pressure_gives_3d_gas_extinction(self):
        """A 3D-pressure common domain must produce column-dependent gas
        absorption, not column-0 everywhere (reference applies numConc cell
        by cell; reference: src/opticalProperties.f95:217-234)."""
        nx, ny, nz = 2, 1, 3
        grid = Grid.regular(nx, ny, nz, 1.0, 1.0, 0.5)
        temps = np.full((nx, ny, nz), 280.0)
        # column 1 has double the pressure (and numConc) of column 0
        num_conc = np.empty((nx, ny, nz))
        num_conc[0] = 1e25
        num_conc[1] = 2e25
        common = CommonDomain(grid=grid, temps=temps, num_conc=num_conc)
        comps, _, _ = components_from_ssp(common, [self._gas_table(nz)], 0,
                                          calc_rayleigh=False)
        ext = comps[0].extinction
        assert ext.shape == (nx, ny, nz)
        np.testing.assert_allclose(ext[1] / ext[0], 2.0, rtol=1e-12)
        np.testing.assert_allclose(ext[0], 1e-25 * 1e25 * 1000.0, rtol=1e-12)

    def test_uniform_pressure_stays_compact(self):
        """Horizontally uniform numConc keeps the cheap (1, 1, nz) layout."""
        grid = Grid.regular(2, 2, 3, 1.0, 1.0, 0.5)
        temps = np.full((2, 2, 3), 280.0)
        num_conc = np.broadcast_to(
            np.array([3e25, 2e25, 1e25]), (2, 2, 3)).copy()
        common = CommonDomain(grid=grid, temps=temps, num_conc=num_conc)
        comps, _, _ = components_from_ssp(common, [self._gas_table(3)], 0,
                                          calc_rayleigh=False)
        assert comps[0].extinction.shape[:2] == (1, 1)

    def test_surface_albedo_from_first_table(self):
        """With multiple SSP tables, surfaceAlbedo comes from the FIRST
        (the reference creates the domain from table 1 in read_SSPTable;
        reference: src/opticalProperties.f95:181-215)."""
        grid = Grid.regular(1, 1, 2, 1.0, 1.0, 0.5)
        temps = np.full((1, 1, 2), 280.0)
        common = CommonDomain(grid=grid, temps=temps,
                              num_conc=np.full((1, 1, 2), 1e25))
        t1 = self._gas_table(2)
        t1.surface_albedo = np.array([0.3])
        t2 = self._gas_table(2)
        t2.surface_albedo = np.array([0.9])
        _, albedo, _ = components_from_ssp(common, [t1, t2], 0,
                                           calc_rayleigh=False)
        assert albedo == pytest.approx(0.3)


class TestVectorizedLWSetup:
    def _make_setup(self, nx=4, ny=3, nz=5, n_lambda=7, seed=0):
        from mcbrat3d_tpu.domain.common import CommonDomain
        r = np.random.RandomState(seed)
        grid = Grid.regular(nx, ny, nz, 0.5, 0.5, 0.25)
        temps = 250.0 + 40.0 * r.rand(nx, ny, nz)
        num_conc = 1e24 * (1.0 + r.rand(nx, ny, nz))
        mass = r.rand(1, nx, ny, nz)
        mass[0, 0] = 0.0  # some empty cells
        reff = 5.0 + 10.0 * r.rand(1, nx, ny, nz)
        common = CommonDomain(grid=grid, temps=temps, num_conc=num_conc,
                              mass_conc=mass, reff=reff)
        freq = C / (np.linspace(8.0, 12.0, n_lambda) * 1e-6)
        key = np.array([4.0, 10.0, 16.0])
        ext = 1.0 + r.rand(3, n_lambda)
        ssa = 0.3 + 0.5 * r.rand(3, n_lambda)
        starts = np.ones((3, n_lambda), np.int64)
        lengths = np.ones((3, n_lambda), np.int64)
        coeffs = np.zeros((1, n_lambda))
        pc = SSPComponent(name="cloud", ext_type="volExt", key=key,
                          extinction=ext, ssa=ssa, legendre_start=starts,
                          legendre_length=lengths, legendre_coeffs=coeffs)
        gc = SSPComponent(name="gas", ext_type="absXsec",
                          xsec=1e-26 * (1.0 + r.rand(nz, n_lambda)))
        tbl = SSPTable(freq_hz=freq,
                       surface_albedo=0.1 + 0.2 * r.rand(n_lambda),
                       components=[pc, gc])
        return common, [tbl]

    def test_matches_per_bin_loop(self):
        """lw_setup_fluxes must equal the per-bin reference-style loop
        (components_from_ssp + absorption_coefficient + emission_weighting)
        for every wavelength."""
        from mcbrat3d_tpu.spectral.weights import lw_setup_fluxes
        common, tables = self._make_setup()
        grid = common.grid
        lambdas = tables[0].lambdas_um
        d_lambda = lambda_widths(lambdas)
        surface_temp = 290.0

        expect = np.zeros(lambdas.size)
        for li in range(lambdas.size):
            comps, albedo, lam_um = components_from_ssp(
                common, tables, li, setup=True, calc_rayleigh=False)
            kabs = absorption_coefficient(comps, grid)
            w = emission_weighting(grid, common.temps, kabs, surface_temp,
                                   1.0 - albedo, lam_um,
                                   d_lambda=d_lambda[li])
            expect[li] = w.total_flux

        got = lw_setup_fluxes(common, tables, d_lambda, surface_temp,
                              lambda_chunk=3)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_cold_surface(self):
        from mcbrat3d_tpu.spectral.weights import lw_setup_fluxes
        common, tables = self._make_setup()
        d_lambda = lambda_widths(tables[0].lambdas_um)
        got = lw_setup_fluxes(common, tables, d_lambda, 0.0)
        comps, albedo, lam_um = components_from_ssp(
            common, tables, 0, setup=True, calc_rayleigh=False)
        kabs = absorption_coefficient(comps, common.grid)
        w = emission_weighting(common.grid, common.temps, kabs, 0.0,
                               1.0, lam_um, d_lambda=d_lambda[0])
        np.testing.assert_allclose(got[0], w.total_flux, rtol=1e-12)


class TestBroadbandLWFastPathDispatch:
    """The PRODUCTION broadband-LW per-bin configuration (gas absXsec +
    particle volExt components from an SSP table, thermal emission source,
    lw_mode) must land inside the record-megakernel envelope -- round-2's
    lesson: assert the dispatch predicate, never assume it
    (reference workload: Drivers/monteCarloDriver.f95:889-1129)."""

    def test_per_bin_domain_is_pallas_eligible(self):
        from mcbrat3d_tpu.domain.common import CommonDomain
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        r = np.random.RandomState(0)
        nx, ny, nz, n_lambda = 8, 8, 6, 3
        grid = Grid.regular(nx, ny, nz, 0.5, 0.5, 0.25)
        temps = 250.0 + 40.0 * r.rand(nx, ny, nz)
        num_conc = 1e24 * (1.0 + r.rand(nx, ny, nz))
        mass = r.rand(1, nx, ny, nz)
        reff = 5.0 + 10.0 * r.rand(1, nx, ny, nz)
        common = CommonDomain(grid=grid, temps=temps, num_conc=num_conc,
                              mass_conc=mass, reff=reff)
        freq = C / (np.linspace(8.0, 12.0, n_lambda) * 1e-6)
        key = np.array([4.0, 10.0, 16.0])
        ext = 1.0 + r.rand(3, n_lambda)
        ssa = 0.3 + 0.5 * r.rand(3, n_lambda)
        starts = np.ones((3, n_lambda), np.int64)
        lengths = np.full((3, n_lambda), 2, np.int64)
        coeffs = 0.5 * r.rand(2, n_lambda)
        pc = SSPComponent(name="cloud", ext_type="volExt", key=key,
                          extinction=ext, ssa=ssa, legendre_start=starts,
                          legendre_length=lengths, legendre_coeffs=coeffs)
        gc = SSPComponent(name="gas", ext_type="absXsec",
                          xsec=1e-26 * (1.0 + r.rand(nz, n_lambda)))
        tbl = SSPTable(freq_hz=freq, surface_albedo=0.05 * np.ones(n_lambda),
                       components=[pc, gc])

        comps, albedo, lam_um = components_from_ssp(
            common, [tbl], 1, setup=False, calc_rayleigh=False)
        domain = build_domain(grid, comps, n_cdf_steps=501,
                              temps=common.temps)
        kabs = absorption_coefficient(comps, grid)
        w = emission_weighting(grid, common.temps, kabs, 290.0,
                               1.0 - albedo, lam_um)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        assert source.em_prob is not None  # alias table built eagerly
        assert domain.n_components == 2 and not domain.all_hg
        reasons = pk.ineligibility_reasons(
            domain, Surface.lambertian(albedo), source,
            lw_mode=True, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        assert reasons == [], reasons
