"""Frozen golden oracles for the I3RC case-1 step cloud.

The I3RC community's published consensus tables are not redistributable in
this repository (and this environment has no network access), so these
goldens were FROZEN from the independent native scalar tracer
(native/tracer.cpp, a clean-room Woodcock implementation) at 40,000,000
photons per case (one-sigma ~8e-5 on each fraction). They pin the absolute
physics -- domain-mean reflectance / transmittance / absorptance of the
reference's i3rcStepCloud cases (reference: Domain-Files/i3rcStepCloud.f95:
16-39) -- so a regression in either the JAX kernel OR the C++ oracle is
caught against fixed numbers rather than against a re-run of the other
implementation.

Tolerances are combined MC noise: sigma_test ~ sqrt(R(1-R)/N) at the test
photon count plus the 8e-5 frozen-value noise, taken at ~4 sigma.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

# (ssa, mu0) -> (R, T, A); frozen 2026-08 from native/tracer.cpp @ 40M
# photons each, seed 12345.
GOLDEN = {
    (1.00, 1.0): (0.32774, 0.67226, 0.00000),
    (1.00, 0.5): (0.58060, 0.41940, 0.00000),
    (0.99, 1.0): (0.26101, 0.59801, 0.14098),
    (0.99, 0.5): (0.47656, 0.32485, 0.19860),
}

N_PHOTONS = 1_000_000


@pytest.mark.parametrize("ssa,mu0", sorted(GOLDEN))
def test_step_cloud_golden_fluxes(ssa, mu0):
    domain = make_step_cloud(ssa=ssa, n_cdf_steps=2001)
    config = KernelConfig(n_lanes=1 << 13, photons_per_lane=123,
                          max_steps=600_000)
    t = run_batch(domain, Surface.lambertian(0.0),
                  illumination.directional(mu0, 0.0),
                  rng.batch_key(7, 0), config, n_photons=N_PHOTONS)
    n = int(t.n_photons)
    assert n == N_PHOTONS
    assert int(t.n_bad) == 0
    R = float(jnp.sum(t.flux_up)) / n
    T = float(jnp.sum(t.flux_down)) / n
    A = float(jnp.sum(t.flux_absorbed)) / n
    gR, gT, gA = GOLDEN[(ssa, mu0)]
    for got, want, name in ((R, gR, "R"), (T, gT, "T"), (A, gA, "A")):
        sigma = np.sqrt(max(want * (1 - want), 1e-8) / N_PHOTONS) + 8e-5
        assert got == pytest.approx(want, abs=4.5 * sigma), (
            f"{name}: got {got:.5f}, frozen golden {want:.5f} "
            f"(ssa={ssa}, mu0={mu0}, 4.5 sigma = {4.5 * sigma:.1e})")
    assert R + T + A == pytest.approx(1.0, abs=2e-4)


class TestAnalyticAnchors:
    """EXTERNAL physics anchors, independent of both implementations.

    The published I3RC consensus tables cannot be transcribed here (no
    network access in this environment to verify them, and they are not
    redistributable), so these tests pin the physics to closed-form
    results instead: Beer-Lambert direct-beam transmission and the
    pure-absorber limit are exact, implementation-independent oracles for
    the same step-cloud geometry (reference:
    Domain-Files/i3rcStepCloud.f95:16-39).
    """

    @pytest.mark.parametrize("mu0", [1.0, 0.5])
    def test_direct_beam_transmission(self, mu0):
        """Order-0 (unscattered) transmitted flux is exactly
        0.5 exp(-2/mu0) + 0.5 exp(-18/mu0) (Beer-Lambert)."""
        domain = make_step_cloud(ssa=1.0, n_cdf_steps=2001)
        config = KernelConfig(n_lanes=1 << 13, photons_per_lane=62,
                              max_steps=600_000,
                              record_scattering_orders=1,
                              use_pallas="off")
        n_want = 500_000
        # azimuth 90: the slant is along y (uniform + periodic), so
        # every ray stays in its x column and the per-column
        # Beer-Lambert formula is exact (an azimuth-0 slant crosses the
        # step boundary mid-path, which has no closed form)
        t = run_batch(domain, Surface.lambertian(0.0),
                      illumination.directional(mu0, 90.0),
                      rng.batch_key(11, 0), config, n_photons=n_want)
        n = int(t.n_photons)
        t_dir = float(jnp.sum(t.flux_down_by_order[:, :, 0])) / n
        want = 0.5 * np.exp(-2.0 / mu0) + 0.5 * np.exp(-18.0 / mu0)
        sigma = np.sqrt(want * (1 - want) / n)
        assert t_dir == pytest.approx(want, abs=5 * sigma + 1e-5), (
            f"direct transmission {t_dir:.6f} vs Beer-Lambert {want:.6f}")

    @pytest.mark.parametrize("mu0", [1.0, 0.5])
    def test_pure_absorber_limit(self, mu0):
        """ssa = 0: no scattering, so R = 0 exactly, T = Beer-Lambert
        direct transmission, A = 1 - T (closed form)."""
        domain = make_step_cloud(ssa=0.0, n_cdf_steps=201)
        config = KernelConfig(n_lanes=1 << 13, photons_per_lane=62,
                              max_steps=600_000)
        n_want = 500_000
        t = run_batch(domain, Surface.lambertian(0.0),
                      illumination.directional(mu0, 90.0),
                      rng.batch_key(13, 0), config, n_photons=n_want)
        n = int(t.n_photons)
        R = float(jnp.sum(t.flux_up)) / n
        T = float(jnp.sum(t.flux_down)) / n
        A = float(jnp.sum(t.flux_absorbed)) / n
        want_t = 0.5 * np.exp(-2.0 / mu0) + 0.5 * np.exp(-18.0 / mu0)
        sigma = np.sqrt(want_t * (1 - want_t) / n)
        assert R == 0.0
        assert T == pytest.approx(want_t, abs=5 * sigma + 1e-5)
        assert A == pytest.approx(1.0 - want_t, abs=5 * sigma + 2e-4)
