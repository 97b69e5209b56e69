"""Unit tests for core utilities: grid, RNG streams, Legendre, Planck."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.core.accumulate import MomentAccumulator, kahan_cumsum
from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.core.legendre import (
    gauss_legendre,
    legendre_eval_series,
    lobatto,
    legendre_moments_from_values,
)
from mcbrat3d_tpu.core.planck import planck_radiance


class TestGrid:
    def test_regular_detection(self):
        g = Grid.from_edges(np.linspace(0, 1, 9), np.linspace(0, 2, 5),
                            np.array([0.0, 0.1, 0.3, 0.7, 1.5]))
        assert g.xy_regular and not g.z_regular
        assert g.shape == (8, 4, 4)

    def test_locate_regular(self):
        g = Grid.regular(4, 4, 4, 0.25, 0.25, 0.25)
        x = jnp.array([0.0, 0.1, 0.26, 0.999, 1.0])
        np.testing.assert_array_equal(g.locate_x(x), [0, 0, 1, 3, 3])

    def test_locate_irregular(self):
        edges = np.array([0.0, 0.1, 0.3, 0.7, 1.5], np.float32)
        g = Grid.from_edges(edges, edges, edges)
        z = jnp.array([0.05, 0.1, 0.3, 1.49, 1.5])
        np.testing.assert_array_equal(g.locate_z(z), [0, 1, 2, 3, 3])

    def test_wrap(self):
        g = Grid.regular(4, 4, 4, 0.25, 0.25, 0.25)
        x = jnp.array([-0.1, 0.5, 1.2, 2.0])
        out = np.asarray(g.wrap_x(x))
        assert np.all((out >= 0) & (out <= 1))
        np.testing.assert_allclose(out, [0.9, 0.5, 0.2, 0.0], atol=1e-6)

    def test_z_from_fraction_irregular(self):
        edges = np.array([0.0, 0.1, 0.3, 0.7, 1.5], np.float32)
        g = Grid.from_edges(edges, edges, edges)
        # fraction 0.5 -> layer 2 bottom (index 2), z = 0.3
        np.testing.assert_allclose(g.z_from_fraction(jnp.float32(0.5)), 0.3,
                                   rtol=1e-6)
        np.testing.assert_allclose(g.z_from_fraction(jnp.float32(1.0)), 1.5,
                                   rtol=1e-6)


class TestRng:
    def test_streams_independent(self):
        k = rng.batch_key(0, 0)
        a = rng.uniform(rng.step_key(k, 3, rng.TAU), (100,))
        b = rng.uniform(rng.step_key(k, 3, rng.COLLISION), (100,))
        assert not np.allclose(a, b)

    def test_deterministic(self):
        a = rng.uniform(rng.step_key(rng.batch_key(7, 2), 5, rng.TAU), (10,))
        b = rng.uniform(rng.step_key(rng.batch_key(7, 2), 5, rng.TAU), (10,))
        np.testing.assert_array_equal(a, b)

    def test_uniform_open_never_zero(self):
        u = rng.uniform_open(jax.random.key(0), (100000,))
        assert np.all(np.asarray(u) > 0)
        assert np.all(np.asarray(u) <= 1)


class TestLegendre:
    def test_hg_series_matches_closed_form(self):
        g = 0.85
        mu = np.linspace(-1, 1, 201)
        coeffs = g ** np.arange(1, 600)
        series = legendre_eval_series(coeffs, mu)
        closed = (1 - g**2) / (1 + g**2 - 2 * g * mu) ** 1.5
        # Normalization: closed form integrates to 2 over mu; series too
        np.testing.assert_allclose(series, closed, rtol=2e-4)

    def test_lobatto_integrates_polynomials(self):
        mus, w = lobatto(8)
        # Exact for degree <= 2*8-3 = 13
        for p in range(0, 13):
            exact = 2.0 / (p + 1) if p % 2 == 0 else 0.0
            np.testing.assert_allclose(np.sum(w * mus**p), exact, atol=1e-12)

    def test_moment_projection_roundtrip(self):
        g = 0.6
        coeffs = g ** np.arange(1, 33)
        mus, w = gauss_legendre(256)
        vals = legendre_eval_series(coeffs, mus)
        rec = legendre_moments_from_values(mus, w, vals, 32)
        np.testing.assert_allclose(rec, coeffs, atol=1e-10)


class TestPlanck:
    def test_wien_peak(self):
        lam = np.linspace(5, 15, 2001)
        b = planck_radiance(lam, 300.0)
        peak = lam[np.argmax(b)]
        assert abs(peak - 2897.77 / 300.0) < 0.02

    def test_stefan_boltzmann(self):
        lam = np.geomspace(0.3, 1000, 20000)
        b = planck_radiance(lam, 288.0)
        total = np.trapezoid(b, lam) * np.pi
        sigma = 5.670374419e-8
        np.testing.assert_allclose(total, sigma * 288.0**4, rtol=1e-3)


class TestAccumulate:
    def test_kahan_cumsum(self):
        x = np.array([1e16, 1.0, -1e16, 1.0])
        out = kahan_cumsum(x)
        np.testing.assert_allclose(out[-1], 2.0)

    def test_moments(self):
        acc = MomentAccumulator()
        rs = np.random.RandomState(0)
        data = rs.normal(5.0, 2.0, size=(64, 10))
        for row in data:
            acc.add(1.0, {"x": row})
        np.testing.assert_allclose(acc.mean("x"), data.mean(0), rtol=1e-12)
        expected_se = data.std(0, ddof=0) / np.sqrt(63)
        np.testing.assert_allclose(acc.stderr("x"), expected_se, rtol=1e-2)

    def test_merge_and_state_roundtrip(self):
        a, b, c = MomentAccumulator(), MomentAccumulator(), MomentAccumulator()
        rs = np.random.RandomState(1)
        for i in range(6):
            arr = {"x": rs.rand(4)}
            (a if i < 3 else b).add(2.0, arr)
            c.add(2.0, arr)
        a.merge(b)
        np.testing.assert_allclose(a.mean("x"), c.mean("x"))
        np.testing.assert_allclose(a.stderr("x"), c.stderr("x"))
        d = MomentAccumulator.from_state_dict(c.state_dict())
        np.testing.assert_allclose(d.stderr("x"), c.stderr("x"))
