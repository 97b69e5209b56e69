"""Phase-function stack tests: HG, normalization, inverse CDF, hybrid."""

import numpy as np
import pytest

from mcbrat3d_tpu.physics.phase_function import (
    PhaseFunction,
    PhaseFunctionTable,
    forward_tabulate,
)
from mcbrat3d_tpu.physics.inverse_cdf import inverse_cdf_single, inverse_cdf_table
from mcbrat3d_tpu.physics.hybrid import hybrid_phase_values


def hg_closed_form(g, mu):
    return (1 - g**2) / (1 + g**2 - 2 * g * mu) ** 1.5


class TestPhaseFunction:
    def test_hg_evaluate(self):
        pf = PhaseFunction.henyey_greenstein(0.85, 512)
        ang = np.linspace(0, np.pi, 181)
        np.testing.assert_allclose(pf.evaluate(ang),
                                   hg_closed_form(0.85, np.cos(ang)), rtol=1e-3)

    def test_angle_value_normalization(self):
        ang = np.linspace(0, np.pi, 721)
        pf = PhaseFunction(angles=ang, values=3.7 * np.ones_like(ang)).normalized()
        mus = np.cos(ang[::-1])
        integral = np.trapezoid(pf.evaluate(ang)[::-1], mus)
        np.testing.assert_allclose(integral, 2.0, rtol=1e-12)

    def test_to_moments(self):
        pf = PhaseFunction.henyey_greenstein(0.5, 32)
        mom = pf.to_moments(8)
        np.testing.assert_allclose(mom, 0.5 ** np.arange(1, 9), atol=1e-8)

    def test_isotropic(self):
        pf = PhaseFunction.isotropic()
        np.testing.assert_allclose(pf.evaluate(np.linspace(0, np.pi, 10)), 1.0)


class TestInverseCdf:
    @pytest.mark.parametrize("g", [0.0, 0.5, 0.85])
    def test_sampling_reproduces_mean_cosine(self, g):
        """Sample scattering angles through the inverse CDF; <cos> must be g."""
        pf = (PhaseFunction.henyey_greenstein(g, 256) if g > 0
              else PhaseFunction.isotropic())
        table = inverse_cdf_single(pf, 9001)
        u = (np.arange(400000) + 0.5) / 400000  # stratified deviates
        t = u * (len(table) - 1)
        k = np.minimum(t.astype(int), len(table) - 2)
        ang = table[k] * (1 - (t - k)) + table[k + 1] * (t - k)
        mean_cos = np.mean(np.cos(ang))
        assert abs(mean_cos - g) < 2e-3

    def test_matches_dense_numerical_inversion(self):
        g = 0.85
        pf = PhaseFunction.henyey_greenstein(g, 512)
        table = inverse_cdf_single(pf, 2001)
        # Dense numerical CDF inversion of the closed form
        mu = np.linspace(-1, 1, 400001)
        p = hg_closed_form(g, mu)
        cdf = np.concatenate(([0], np.cumsum(np.diff(mu) * 0.5 * (p[1:] + p[:-1]))))
        cdf /= cdf[-1]
        probs = np.arange(2001) / 2000
        mu_exact = np.interp(probs, cdf, mu)
        ang_exact = np.arccos(mu_exact)
        np.testing.assert_allclose(table, ang_exact, atol=2e-3)

    def test_endpoints(self):
        pf = PhaseFunction.henyey_greenstein(0.85, 128)
        table = inverse_cdf_single(pf, 1001)
        assert table[0] == pytest.approx(np.pi, abs=1e-6)  # CDF=0 -> backscatter
        assert table[-1] == 0.0  # CDF=1 -> forward

    def test_table_stacking(self):
        tbl = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.5, 64),
             PhaseFunction.isotropic()], key=[1.0, 2.0])
        inv = inverse_cdf_table(tbl, 501)
        assert inv.shape == (2, 501)
        # Isotropic: mu uniform -> angle = acos(2p-1)
        probs = np.arange(501) / 500
        np.testing.assert_allclose(inv[1], np.arccos(np.clip(2 * probs - 1, -1, 1)),
                                   atol=1e-6)


class TestHybrid:
    def test_normalization_preserved(self):
        ang = np.linspace(0, np.pi, 1801)
        tbl = PhaseFunctionTable([PhaseFunction.henyey_greenstein(0.85, 128)],
                                 key=[1.0])
        vals = forward_tabulate(tbl, 1801)
        hyb = hybrid_phase_values(ang, vals, gaussian_width_deg=10.0)
        mus = np.cos(ang[::-1])
        integral = np.trapezoid(hyb[0][::-1], mus)
        np.testing.assert_allclose(integral, 2.0, rtol=1e-3)

    def test_forward_peak_flattened(self):
        ang = np.linspace(0, np.pi, 1801)
        tbl = PhaseFunctionTable([PhaseFunction.henyey_greenstein(0.85, 128)],
                                 key=[1.0])
        vals = forward_tabulate(tbl, 1801)
        hyb = hybrid_phase_values(ang, vals, gaussian_width_deg=10.0)
        assert hyb[0, 0] < vals[0, 0]  # peak reduced
        np.testing.assert_allclose(hyb[0, -200:], vals[0, -200:])  # tail intact
