"""Mie solver and table-generation validation."""

import numpy as np
import pytest

from mcbrat3d_tpu.core.legendre import legendre_eval_series
from mcbrat3d_tpu.physics.mie import mie_batch, mie_numpy
from mcbrat3d_tpu.physics.refractive import refractive_index
from mcbrat3d_tpu.tools.mie_table import (
    MieTableConfig,
    adjusted_distribution,
    make_mie_table,
    size_distribution,
    size_grid,
)

MU, WQ = np.polynomial.legendre.leggauss(512)


class TestMieSolver:
    def test_rayleigh_limit(self):
        """x << 1: Qsca -> (8/3) x^4 |(m^2-1)/(m^2+2)|^2, P ~ 1 + mu^2."""
        m = 1.33 + 0.0j
        x = 0.01
        qe, qs, inten = mie_batch([x], m, MU)
        expect = 8.0 / 3.0 * x**4 * abs((m * m - 1) / (m * m + 2)) ** 2
        np.testing.assert_allclose(qs[0], expect, rtol=1e-4)
        P = inten[0] / inten[0][np.argmin(np.abs(MU))]
        np.testing.assert_allclose(P, (1 + MU**2) / 1.0, rtol=2e-3)

    def test_extinction_paradox(self):
        qe, qs, _ = mie_batch([300.0], 1.33 + 0.0j, MU[:8])
        assert abs(qe[0] - 2.0) < 0.1

    def test_energy_conservation_nonabsorbing(self):
        qe, qs, _ = mie_batch([0.5, 5.0, 50.0], 1.45 + 0.0j, MU[:4])
        np.testing.assert_allclose(qe, qs, rtol=1e-9)

    def test_absorbing_qext_exceeds_qsca(self):
        qe, qs, _ = mie_batch([10.0], 1.33 + 0.05j, MU[:4])
        assert qe[0] > qs[0] > 0

    def test_phase_normalization_identity(self):
        """integral over mu of 4 I/(x^2 Qsca) == 2 for any sphere."""
        for x in [1.0, 12.3, 77.0]:
            qe, qs, inten = mie_batch([x], 1.31 + 0.001j, MU)
            integral = np.sum(WQ * 4.0 * inten[0] / (x * x * qs[0]))
            np.testing.assert_allclose(integral, 2.0, rtol=1e-6)

    def test_native_matches_numpy(self):
        qe1, qs1, i1 = mie_batch([7.7], 1.33 + 0.01j, MU)
        qe2, qs2, i2 = mie_batch([7.7], 1.33 + 0.01j, MU, force_numpy=True)
        np.testing.assert_allclose(qe1, qe2, rtol=1e-12)
        np.testing.assert_allclose(i1, i2, rtol=1e-9)


class TestRefractiveIndex:
    def test_water_visible(self):
        m = refractive_index("W", 0.55)
        assert 1.32 < m.real < 1.34
        assert -1e-7 < m.imag <= 0

    def test_ice_thermal(self):
        m = refractive_index("I", 11.0)
        assert m.imag < -0.01  # strongly absorbing in the window

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            refractive_index("W", 0.01)


class TestSizeDistribution:
    def test_gamma_reff_adjustment(self):
        radii = size_grid(5.0, 60.0, 0.55)
        nd = adjusted_distribution(radii, 10.0, 7.0, "G", 1.0)
        true_re = np.sum(nd * radii**3) / np.sum(nd * radii**2)
        assert abs(true_re - 10.0) < 0.01 * 10.0
        # LWC = 1 g/m^3
        lwc = 1e-6 * 1.0 * (4 * np.pi / 3) * np.sum(nd * radii**3)
        np.testing.assert_allclose(lwc, 1.0, rtol=1e-6)

    def test_lognormal(self):
        radii = size_grid(5.0, 60.0, 0.55)
        nd, true_re = size_distribution(radii, 10.0, 0.35, "L", 1.0)
        assert nd.min() >= 0
        assert 5.0 < true_re < 20.0


class TestMieTable:
    @pytest.fixture(scope="class")
    def table(self):
        cfg = MieTableConfig(wavelen1=0.55, partype="W", sretab=5.0,
                             eretab=15.0, nretanb=3, maxradius=40.0,
                             alpha=7.0, distflag="G")
        return make_mie_table(cfg)

    def test_extinction_scale(self, table):
        """beta [km^-1] ~ 3 Qext LWC/(4 rho reff) with Qext ~ 2.1 for
        droplets >> wavelength; LWC = 1 g/m^3."""
        for i, reff in enumerate(table.key):
            # SI: beta[m^-1] = 3 Qext LWC[kg/m^3] / (4 rho[kg/m^3] r[m]);
            # LWC = 1 g/m^3 = 1e-3 kg/m^3, rho = 1000 kg/m^3, r = reff um.
            beta_m = 3.0 * 2.1 * 1e-3 / (4.0 * 1000.0 * reff * 1e-6)
            expect = beta_m * 1000.0  # km^-1
            assert abs(table.extinction[i] - expect) < 0.15 * expect, (
                reff, table.extinction[i], expect)

    def test_ssa_near_one_visible(self, table):
        assert np.all(table.single_scattering_albedo > 0.999999)

    def test_asymmetry_parameter(self, table):
        """Water clouds at 0.55 um: g in [0.8, 0.89]."""
        for pf in table.phase_functions:
            g = pf.coefficients[0]
            assert 0.80 < g < 0.89, g

    def test_phase_function_positive(self, table):
        ang = np.linspace(0, np.pi, 361)
        for pf in table.phase_functions:
            vals = pf.evaluate(ang)
            assert vals.min() > -0.02 * vals.max()  # Legendre ringing bound

    def test_netcdf_roundtrip(self, table, tmp_path):
        from mcbrat3d_tpu.domain.io_netcdf import (
            read_phase_function_table_file,
            write_phase_function_table,
        )
        path = str(tmp_path / "mie.pft")
        write_phase_function_table(table, path)
        back = read_phase_function_table_file(path)
        assert back.n_entries == table.n_entries
        np.testing.assert_allclose(back.extinction, table.extinction,
                                   rtol=1e-6)


class TestBandAveragedMie:
    """avgflag='A' Planck-weighted band averaging over deltawave steps
    (reference: Tools/MakeMieTable.f95:523-595)."""

    def _cfg(self, **kw):
        from mcbrat3d_tpu.tools.mie_table import MieTableConfig
        base = dict(wavelen1=10.0, wavelen2=11.0, avgflag="A",
                    deltawave=0.25, partype="W", alpha=7.0,
                    distflag="G", sretab=8.0, eretab=8.0, nretanb=1,
                    maxradius=30.0, max_legendre=64)
        base.update(kw)
        return MieTableConfig(**base)

    def test_band_average_between_endpoints(self):
        """The band-averaged extinction must lie between the two
        single-wavelength endpoint tables (Qext varies monotonically
        across this narrow thermal-IR band for water)."""
        from mcbrat3d_tpu.tools.mie_table import make_mie_table

        t_avg = make_mie_table(self._cfg())
        t_lo = make_mie_table(self._cfg(wavelen2=10.0, avgflag="C"))
        t_hi = make_mie_table(self._cfg(wavelen1=11.0, avgflag="C"))
        e_avg = float(np.asarray(t_avg.extinction)[0])
        e_lo = float(np.asarray(t_lo.extinction)[0])
        e_hi = float(np.asarray(t_hi.extinction)[0])
        lo, hi = min(e_lo, e_hi), max(e_lo, e_hi)
        assert lo <= e_avg <= hi
        # and it differs from the center-wavelength table (deltawave is
        # genuinely exercised, not dead)
        t_c = make_mie_table(self._cfg(avgflag="C"))
        e_c = float(np.asarray(t_c.extinction)[0])
        assert e_avg != pytest.approx(e_c, rel=1e-6)
