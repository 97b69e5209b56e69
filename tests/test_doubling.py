"""External multiple-scattering anchor: doubling-adding vs Monte Carlo.

The published I3RC consensus tables cannot be transcribed here, so this
test pins a SCATTERING-DOMINATED regime to an independent deterministic
solver: the doubling method for plane-parallel slabs (van de Hulst 1963;
Hansen & Travis 1974, Space Sci. Rev. 16, 527, section 5), implemented
below from the literature. Neither the JAX kernel nor native/tracer.cpp
produced these expected values -- the solver shares no code or method
(deterministic discrete-ordinate doubling vs Monte Carlo) with either.

Derivation used (operator form). Work on N Gauss-Legendre nodes mu_i in
(0,1) with weights w_i and measure M = diag(2 mu_i w_i). For a homogeneous
layer let R be the diffuse reflection kernel and G the TOTAL transmission
operator (diffuse kernel x measure + direct diag(exp(-tau/mu))). With
A = R M, stacking two identical layers and eliminating the interface
fields gives the doubling step

    D   = (I - A A)^{-1} G          (downward field at the interface)
    A'  = A + G A D                 (combined reflection x measure)
    G'  = G D                       (combined total transmission)

initialized from the single-scattering thin-layer limit (Hansen & Travis
eq. 64) at tau_0 = tau / 2^K <= 1e-6:

    R_0(mu_i, mu_j) = ssa tau_0 / (4 mu_i mu_j) p-(mu_i, mu_j)
    T_0(mu_i, mu_j) = ssa tau_0 / (4 mu_i mu_j) p+(mu_i, mu_j)

where p+/p- are the azimuth-averaged phase functions between same /
opposite hemispheres: by the addition theorem the m=0 Fourier mode of
P(cos Theta) is sum_l (2l+1) chi_l P_l(mu) P_l(+-mu') (chi_l = g^l for
Henyey-Greenstein). For a collimated beam of unit horizontal flux at a
node mu_k, plane albedo and total transmittance follow from the kernels:

    albedo(mu_k) = sum_i 2 mu_i w_i A[i,k] / (2 mu_k w_k)
    trans(mu_k)  = sum_i 2 mu_i w_i G[i,k] / (2 mu_k w_k)

The MC side runs the identical configuration: a homogeneous HG slab
(periodic horizontal boundaries = plane-parallel), black surface,
mu_0 set exactly to a quadrature node.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.phase_function import PhaseFunction
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch


def doubling_slab(tau, ssa, g, n_nodes=48, n_leg=300, tau0=1e-8):
    """Doubling solution for a homogeneous HG slab.

    Returns (mu, albedo, transmittance): plane albedo and total (direct +
    diffuse) transmittance for a collimated beam incident at each
    quadrature node.
    """
    x, w = np.polynomial.legendre.leggauss(n_nodes)
    mu = 0.5 * (x + 1.0)
    wt = 0.5 * w
    m = 2.0 * mu * wt  # the measure diag(2 mu w)

    # Legendre polynomials P_l(mu) by recurrence, l = 0..n_leg-1
    P = np.zeros((n_leg, n_nodes))
    P[0] = 1.0
    P[1] = mu
    for l in range(1, n_leg - 1):
        P[l + 1] = ((2 * l + 1) * mu * P[l] - l * P[l - 1]) / (l + 1)
    chi = (2 * np.arange(n_leg) + 1.0) * g ** np.arange(n_leg)
    pp = np.einsum("l,li,lj->ij", chi, P, P)                    # same hemi
    pm = np.einsum("l,li,lj->ij", chi * (-1.0) ** np.arange(n_leg), P, P)

    K = max(1, int(np.ceil(np.log2(tau / tau0))))
    t0 = tau / 2.0 ** K
    scale = ssa * t0 / (4.0 * np.outer(mu, mu))
    A = (scale * pm) * m[None, :]                    # R_0 M
    G = (scale * pp) * m[None, :] + np.diag(np.exp(-t0 / mu))
    eye = np.eye(n_nodes)
    for _ in range(K):
        D = np.linalg.solve(eye - A @ A, G)
        A, G = A + G @ A @ D, G @ D
    albedo = m @ A / m
    trans = m @ G / m
    return mu, albedo, trans


class TestDoublingSolverInternal:
    """Internal consistency of the solver itself (no MC involved)."""

    def test_conservative_energy_closure(self):
        mu, alb, trans = doubling_slab(tau=8.0, ssa=1.0, g=0.85)
        np.testing.assert_allclose(alb + trans, 1.0, atol=2e-5)

    def test_thin_limit_single_scattering(self):
        """tau -> 0: albedo(mu0) -> ssa tau / (2 mu0) * int_0^1 p-(mu,mu0)
        dmu / 2 ... computed directly from the same p- (checks the
        doubling recursion against its own first-order seed at a much
        larger tau0 ratio), and total transmittance -> 1 - tau/mu0 +
        scattered-forward part."""
        tau = 1e-3
        mu, alb, trans = doubling_slab(tau=tau, ssa=1.0, g=0.5,
                                       n_nodes=32, n_leg=128)
        # direct single-scattering formula on the same grid
        x, w = np.polynomial.legendre.leggauss(32)
        mug = 0.5 * (x + 1)
        wg = 0.5 * w
        P = np.zeros((128, 32))
        P[0] = 1.0
        P[1] = mug
        for l in range(1, 127):
            P[l + 1] = ((2 * l + 1) * mug * P[l] - l * P[l - 1]) / (l + 1)
        chi = (2 * np.arange(128) + 1.0) * 0.5 ** np.arange(128)
        pm = np.einsum("l,li,lj->ij", chi * (-1.0) ** np.arange(128), P, P)
        k = 16
        # single scattering: flux_up = ssa*tau * sum_i w_i pm[i,k] / (2 mu_k)
        want = tau / (2 * mug[k]) * np.sum(wg * pm[:, k])
        assert alb[k] == pytest.approx(want, rel=1e-3)

    def test_pure_absorber(self):
        mu, alb, trans = doubling_slab(tau=2.0, ssa=1e-12, g=0.85,
                                       n_nodes=32, n_leg=64)
        np.testing.assert_allclose(alb, 0.0, atol=1e-10)
        # grazing nodes underflow exp(-tau/mu) to 0 -- compare with atol too
        np.testing.assert_allclose(trans, np.exp(-2.0 / mu), rtol=1e-6,
                                   atol=1e-12)

    def test_isotropic_semi_infinite_chandrasekhar(self):
        """Conservative isotropic scattering, tau -> inf: the plane albedo
        is 1 - 2 mu0 H'... instead pin the EXACT known value: spherical
        albedo of the conservative semi-infinite isotropic atmosphere is 1,
        and the plane albedo at mu0=1 from Chandrasekhar's H-function
        tables is 1 - sqrt(3) mu0 ... use the well-known exact escape
        result: albedo -> 1 for every mu0 (no absorption, nothing
        transmitted)."""
        mu, alb, trans = doubling_slab(tau=2.0 ** 14, ssa=1.0, g=0.0,
                                       n_nodes=32, n_leg=4)
        np.testing.assert_allclose(alb, 1.0, atol=5e-3)
        np.testing.assert_allclose(trans, 0.0, atol=5e-3)


def _mc_slab_fluxes(tau, ssa, g, mu0, n_photons, seed=21):
    dom = make_slab(tau=tau, ssa=ssa,
                    phase=PhaseFunction.henyey_greenstein(g, 64),
                    nx=2, ny=2, nz=8, n_cdf_steps=201)
    cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=128,
                       max_steps=400_000)
    t = run_batch(dom, Surface.lambertian(0.0),
                  illumination.directional(mu0, 0.0),
                  rng.batch_key(seed, 0), cfg, n_photons=n_photons)
    n = int(t.n_photons)
    assert n == n_photons
    assert int(t.n_bad) == 0
    R = float(np.sum(np.asarray(t.flux_up))) / n
    T = float(np.sum(np.asarray(t.flux_down))) / n
    A = float(np.sum(np.asarray(t.flux_absorbed))) / n
    return R, T, A


class TestDoublingVsMonteCarlo:
    """The anchor: scattering-dominated HG slabs, MC vs doubling at 4 sigma.

    mu0 is set exactly to a quadrature node so no interpolation enters.
    """

    N = 400_000

    @pytest.mark.parametrize("tau,ssa,g", [
        (8.0, 1.0, 0.85),    # conservative, strongly forward-peaked
        (8.0, 0.99, 0.85),   # absorbing via high-order scattering
        (2.0, 1.0, 0.0),     # conservative isotropic, moderate depth
    ])
    def test_slab_albedo_and_transmittance(self, tau, ssa, g):
        mu, alb, trans = doubling_slab(tau=tau, ssa=ssa, g=g)
        k = int(np.argmin(np.abs(mu - 0.5)))  # node nearest mu0 = 0.5
        mu0 = float(mu[k])
        R, T, A = _mc_slab_fluxes(tau, ssa, g, mu0, self.N)
        sig_r = np.sqrt(alb[k] * (1 - alb[k]) / self.N) + 3e-4
        sig_t = np.sqrt(trans[k] * (1 - trans[k]) / self.N) + 3e-4
        assert R == pytest.approx(alb[k], abs=4 * sig_r), (
            f"MC albedo {R:.5f} vs doubling {alb[k]:.5f}")
        assert T == pytest.approx(trans[k], abs=4 * sig_t), (
            f"MC transmittance {T:.5f} vs doubling {trans[k]:.5f}")
        assert R + T + A == pytest.approx(1.0, abs=2e-4)
