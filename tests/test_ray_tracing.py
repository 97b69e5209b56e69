"""Ray-traced (DDA) free-path mode vs maximum cross-section mode.

Both samplers solve the same transport problem; their expectations must
agree (reference offers the same pair of modes; reference:
Integrators/monteCarloRadiativeTransfer.f95:555-571).
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport import dda


def rta(domain, cfg, seeds, mu0=0.5, albedo=0.0):
    vals = []
    for s in seeds:
        t = run_batch(domain, Surface.lambertian(albedo),
                      illumination.directional(mu0, 0.0),
                      rng.batch_key(s, 0), cfg)
        n = int(t.n_photons)
        vals.append([float(np.sum(np.asarray(t.flux_up))) / n,
                     float(np.sum(np.asarray(t.flux_down))) / n,
                     float(np.sum(np.asarray(t.flux_absorbed))) / n])
    v = np.asarray(vals)
    return v.mean(0), v.std(0, ddof=1) / np.sqrt(len(seeds))


class TestDDAMarcher:
    def test_straight_ray_optical_depth(self):
        """Vertical ray through the thick half of the step cloud: tau = 18."""
        dom = make_step_cloud(ssa=1.0, n_cdf_steps=101)
        x = np.asarray([400.0], np.float32)  # thick half
        y = np.asarray([250.0], np.float32)
        z = np.asarray([0.01], np.float32)
        r = dda.trace(dom, x, y, z, np.zeros(1, np.float32),
                      np.zeros(1, np.float32), np.ones(1, np.float32),
                      np.array([True]))
        assert bool(r["exit_top"][0])
        np.testing.assert_allclose(float(r["tau"][0]), 18.0, rtol=1e-3)

    def test_oblique_ray_with_periodic_wrap(self):
        """45-degree ray in x-z: path length per cell = sqrt(2) * dz, and x
        wraps periodically; total tau = tau_column * sqrt(2) since the ray
        crosses the full depth at 45 degrees through mixed columns."""
        dom = make_slab(tau=2.0, ssa=1.0, nx=4, ny=4, nz=8, n_cdf_steps=101)
        s = np.float32(1 / np.sqrt(2))
        r = dda.trace(dom, np.asarray([0.5], np.float32),
                      np.asarray([0.5], np.float32),
                      np.asarray([0.001], np.float32),
                      np.asarray([s]), np.zeros(1, np.float32),
                      np.asarray([s]), np.array([True]))
        assert bool(r["exit_top"][0])
        np.testing.assert_allclose(float(r["tau"][0]),
                                   2.0 * np.sqrt(2) * (1.0 - 0.001),
                                   rtol=1e-4)

    def test_tau_stop_inside_domain(self):
        dom = make_slab(tau=4.0, ssa=1.0, nx=2, ny=2, nz=8, n_cdf_steps=101)
        r = dda.trace(dom, np.asarray([0.5], np.float32),
                      np.asarray([0.5], np.float32),
                      np.asarray([0.999], np.float32),
                      np.zeros(1, np.float32), np.zeros(1, np.float32),
                      -np.ones(1, np.float32), np.array([True]),
                      tau_stop=np.asarray([1.5], np.float32))
        assert bool(r["stopped"][0])
        np.testing.assert_allclose(float(r["tau"][0]), 1.5, rtol=1e-5)
        # z where tau=1.5 from top: depth = 1.5/4 of the slab
        np.testing.assert_allclose(float(r["z"][0]), 0.999 - 1.5 / 4.0,
                                   rtol=1e-3)


class TestRayTracingMode:
    def test_conservation(self):
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=2,
                           max_steps=3000, use_ray_tracing=True,
                           use_russian_roulette=False)
        dom = make_step_cloud(ssa=0.99, n_cdf_steps=501)
        t = run_batch(dom, Surface.lambertian(0.0),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg)
        n = int(t.n_photons)
        total = (float(np.sum(np.asarray(t.flux_up)))
                 + float(np.sum(np.asarray(t.flux_down)))
                 + float(np.sum(np.asarray(t.flux_absorbed))))
        assert int(t.n_bad) == 0
        np.testing.assert_allclose(total, n, rtol=1e-4)

    def test_agrees_with_max_cross_section(self):
        dom = make_step_cloud(ssa=0.99, n_cdf_steps=501)
        cfg_ray = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                               max_steps=3000, use_ray_tracing=True)
        cfg_mxs = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                               max_steps=6000, use_ray_tracing=False)
        m_ray, e_ray = rta(dom, cfg_ray, seeds=range(3))
        m_mxs, e_mxs = rta(dom, cfg_mxs, seeds=range(3, 6))
        sigma = np.sqrt(e_ray**2 + e_mxs**2) + 1e-4
        assert np.all(np.abs(m_ray - m_mxs) < 4 * sigma + 0.01 * m_mxs), (
            m_ray, m_mxs, sigma)
