"""End-to-end transport kernel validation against analytic oracles.

Mirrors the validation strategy the reference implies (plane-parallel checks,
conservation, statistical agreement; reference: Drivers/planeParallel.f95,
SURVEY.md section 4) but as a real automated test pyramid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.phase_function import PhaseFunction
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

CFG = KernelConfig(n_lanes=1 << 13, photons_per_lane=4, max_steps=4000)
BLACK = Surface.lambertian(0.0)


def _run(domain, source, surface=BLACK, cfg=CFG, seed=0, batch=0):
    return run_batch(domain, surface, source, rng.batch_key(seed, batch), cfg)


class TestConservation:
    def test_conservative_slab_exact_balance(self):
        """ssa=1, black surface: every started photon exits up or down with
        weight exactly 1 (no RR in a conservative medium)."""
        dom = make_slab(tau=2.0, ssa=1.0, n_cdf_steps=2001)
        t = _run(dom, illumination.directional(0.707, 0.0))
        n = int(t.n_photons)
        assert n == CFG.photons_per_batch
        up = float(jnp.sum(t.flux_up))
        down = float(jnp.sum(t.flux_down))
        assert int(t.n_bad) == 0
        np.testing.assert_allclose(up + down, n, rtol=1e-6)
        assert float(jnp.sum(t.flux_absorbed)) == 0.0

    def test_absorbing_slab_energy_balance(self):
        """up + down + absorbed == started (RR preserves expectation; with
        RR off the balance is exact)."""
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=4,
                           max_steps=4000, use_russian_roulette=False)
        dom = make_slab(tau=3.0, ssa=0.9, n_cdf_steps=2001)
        t = _run(dom, illumination.directional(1.0, 0.0), cfg=cfg)
        total = (float(jnp.sum(t.flux_up)) + float(jnp.sum(t.flux_down))
                 + float(jnp.sum(t.flux_absorbed)))
        np.testing.assert_allclose(total, float(t.n_photons), rtol=1e-5)

    def test_volume_absorption_matches_flux_absorbed(self):
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=2,
                           max_steps=4000, use_russian_roulette=False)
        dom = make_slab(tau=3.0, ssa=0.8, n_cdf_steps=2001)
        t = _run(dom, illumination.directional(1.0, 0.0), cfg=cfg)
        # f32 scatter-add ordering differs between the two buffers
        np.testing.assert_allclose(float(jnp.sum(t.volume_absorption)),
                                   float(jnp.sum(t.flux_absorbed)), rtol=1e-4)


class TestBeerLambert:
    @pytest.mark.parametrize("tau,mu", [(1.0, 1.0), (2.0, 0.5)])
    def test_direct_transmission(self, tau, mu):
        """Pure absorption (ssa=0): downward flux = exp(-tau/mu)."""
        dom = make_slab(tau=tau, ssa=0.0, n_cdf_steps=101)
        t = _run(dom, illumination.directional(mu, 0.0))
        n = int(t.n_photons)
        trans = float(jnp.sum(t.flux_down)) / n
        expect = np.exp(-tau / mu)
        sigma = np.sqrt(expect * (1 - expect) / n)
        assert abs(trans - expect) < 4 * sigma + 1e-6


class TestLambertianSurface:
    def test_perfect_mirror_closed_system(self):
        """tau=0 medium + albedo 1 surface: all photons eventually exit up."""
        dom = make_slab(tau=1e-6, ssa=1.0, n_cdf_steps=101)
        t = _run(dom, illumination.directional(1.0, 0.0),
                 surface=Surface.lambertian(1.0))
        n = int(t.n_photons)
        np.testing.assert_allclose(float(jnp.sum(t.flux_up)), n, rtol=1e-5)
        np.testing.assert_allclose(float(jnp.sum(t.flux_down)), n, rtol=1e-5)

    def test_albedo_half(self):
        """tau=0, albedo a: flux_up/n = a (single bounce)."""
        dom = make_slab(tau=1e-6, ssa=1.0, n_cdf_steps=101)
        t = _run(dom, illumination.directional(1.0, 0.0),
                 surface=Surface.lambertian(0.5))
        n = int(t.n_photons)
        up = float(jnp.sum(t.flux_up)) / n
        np.testing.assert_allclose(up, 0.5, atol=1e-3)


class TestRayleighSlabAnalytic:
    def test_thin_isotropic_slab_reflectance(self):
        """Single-scattering limit: R ~ ssa*tau/(2*mu0) * ... for thin tau.

        For an isotropic-scattering thin slab, first-order reflectance at
        normal incidence is R1 = ssa * tau / 2 * integral(exp growth) ->
        approx ssa*tau/2 for small tau. Use tau=0.02 where higher orders are
        < 1e-3 relative.
        """
        tau = 0.02
        dom = make_slab(tau=tau, ssa=1.0, nz=4, n_cdf_steps=2001)
        cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=8, max_steps=2000)
        t = _run(dom, illumination.directional(1.0, 0.0), cfg=cfg)
        n = int(t.n_photons)
        refl = float(jnp.sum(t.flux_up)) / n
        # First order: scatter at depth s (density e^-s), half the photons go
        # up with uniform mu, escape probability e^(-s/mu):
        #   R1 = int_0^tau ds e^-s (1/2) int_0^1 dmu e^(-s/mu)
        s = np.linspace(0, tau, 401)
        mu = np.linspace(1e-4, 1, 401)
        inner = np.trapezoid(np.exp(-s[:, None] / mu[None, :]), mu, axis=1)
        r1 = 0.5 * np.trapezoid(np.exp(-s) * inner, s)
        sigma = np.sqrt(max(refl, r1) / n) + 1e-7
        assert abs(refl - r1) < 5 * sigma + 0.02 * r1


class TestStepCloud:
    def test_runs_and_conserves(self):
        dom = make_step_cloud(ssa=0.99)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=2,
                           max_steps=6000, use_russian_roulette=False)
        t = _run(dom, illumination.directional(0.5, 0.0), cfg=cfg)
        n = int(t.n_photons)
        total = (float(jnp.sum(t.flux_up)) + float(jnp.sum(t.flux_down))
                 + float(jnp.sum(t.flux_absorbed)))
        np.testing.assert_allclose(total, n, rtol=1e-4)
        assert int(t.n_bad) == 0

    def test_thick_half_reflects_more(self):
        dom = make_step_cloud(ssa=1.0)
        t = _run(dom, illumination.directional(0.866, 0.0))
        norm = t.normalized(dom.grid)
        up = np.asarray(norm.flux_up)[:, 0]
        thin = up[:16].mean()
        thick = up[16:].mean()
        # tau=18 reflects much more than tau=2 (horizontal transport between
        # the 3D columns softens the contrast below the 1D-column ratio)
        assert thick > 1.4 * thin

    def test_reproducible(self):
        dom = make_step_cloud(ssa=1.0)
        t1 = _run(dom, illumination.directional(0.5, 0.0), seed=3, batch=7)
        t2 = _run(dom, illumination.directional(0.5, 0.0), seed=3, batch=7)
        np.testing.assert_array_equal(np.asarray(t1.flux_up),
                                      np.asarray(t2.flux_up))

    def test_batches_differ(self):
        dom = make_step_cloud(ssa=1.0)
        t1 = _run(dom, illumination.directional(0.5, 0.0), seed=3, batch=0)
        t2 = _run(dom, illumination.directional(0.5, 0.0), seed=3, batch=1)
        assert not np.array_equal(np.asarray(t1.flux_up),
                                  np.asarray(t2.flux_up))


class TestSources:
    def test_flux_source_mu_distribution(self):
        src = illumination.flux()
        xf, yf, zf, mu, phi = illumination.sample(src, jax.random.key(0), 200000)
        mu = np.asarray(mu)
        assert np.all(mu < 0)
        # mu = -sqrt(u) -> E[|mu|] = 2/3
        np.testing.assert_allclose(np.mean(-mu), 2.0 / 3.0, atol=3e-3)

    def test_spotlight_fixed(self):
        src = illumination.spotlight(0.5, 90.0, 0.25, 0.75)
        xf, yf, zf, mu, phi = illumination.sample(src, jax.random.key(0), 16)
        np.testing.assert_allclose(np.asarray(xf), 0.25)
        np.testing.assert_allclose(np.asarray(mu), -0.5)


class TestScatteringOrderTallies:
    def test_orders_sum_to_total(self):
        """Per-order boundary fluxes must sum to the total fluxes, and
        order-0 upward flux must be zero for a black surface (a photon
        cannot reach the top without at least one scattering)."""
        from mcbrat3d_tpu.scenes.plane_parallel import make_slab
        dom = make_slab(tau=2.0, ssa=1.0, n_cdf_steps=501)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                           max_steps=4000, record_scattering_orders=6)
        t = _run(dom, illumination.directional(0.5, 0.0), cfg=cfg)
        up = np.asarray(t.flux_up)
        up_by = np.asarray(t.flux_up_by_order)
        dn_by = np.asarray(t.flux_down_by_order)
        np.testing.assert_allclose(up_by.sum(axis=2), up, rtol=1e-4)
        np.testing.assert_allclose(dn_by.sum(axis=2),
                                   np.asarray(t.flux_down), rtol=1e-4)
        assert up_by[:, :, 0].sum() == 0.0  # no zeroth-order reflection
        # direct (order 0) transmission matches Beer-Lambert exp(-tau/mu0)
        n = int(t.n_photons)
        direct = dn_by[:, :, 0].sum() / n
        expect = np.exp(-2.0 / 0.5)
        assert abs(direct - expect) < 5 * np.sqrt(expect / n) + 1e-3


class TestMacroMajorant:
    def test_conservation_and_agreement(self):
        """Two-level Woodcock (macro-cell majorants) must reproduce the
        global-majorant results and conserve energy, while taking fewer
        wave steps on a heterogeneous domain."""
        dom_g = make_step_cloud(ssa=0.99, n_cdf_steps=501)
        dom_m = make_step_cloud(ssa=0.99, n_cdf_steps=501, macro_factor=8)
        assert dom_m.macro_factor == 8
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=4,
                           max_steps=100000, use_russian_roulette=False)

        def rta(dom, seeds):
            out = []
            for s in seeds:
                t = _run(dom, illumination.directional(0.5, 0.0), cfg=cfg,
                         seed=s)
                n = int(t.n_photons)
                total = (float(jnp.sum(t.flux_up))
                         + float(jnp.sum(t.flux_down))
                         + float(jnp.sum(t.flux_absorbed)))
                np.testing.assert_allclose(total, n, rtol=1e-4)
                out.append([float(jnp.sum(t.flux_up)) / n,
                            float(jnp.sum(t.flux_down)) / n,
                            float(jnp.sum(t.flux_absorbed)) / n,
                            int(t.n_steps)])
            return np.asarray(out)

        g = rta(dom_g, range(3))
        m = rta(dom_m, range(3, 6))
        sig = (g[:, :3].std(0, ddof=1) + m[:, :3].std(0, ddof=1)) / np.sqrt(3)
        assert np.all(np.abs(g[:, :3].mean(0) - m[:, :3].mean(0))
                      < 5 * sig + 0.01)
        # fewer steps with local majorants (thin half: 9x smaller ceiling;
        # wave-tail stragglers dilute the reduction at small quotas)
        assert m[:, 3].mean() < 0.92 * g[:, 3].mean(), (
            m[:, 3].mean(), g[:, 3].mean())

    def test_empty_macro_blocks_traversed(self):
        """A cloud occupying only the lower half: photons cross the clear
        upper blocks in one clipped step each; results stay exact."""
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        grid = Grid.regular(8, 8, 16, 0.125, 0.125, 0.125)
        ext = np.zeros((8, 8, 16))
        ext[:, :, :8] = 4.0  # cloud below, vacuum above
        tbl = PhaseFunctionTable([PhaseFunction.henyey_greenstein(0.85, 64)],
                                 key=[1.0])
        comp = OpticalComponent("c", ext, np.full_like(ext, 1.0),
                                np.zeros(ext.shape, np.int32), tbl)
        dom = build_domain(grid, [comp], n_cdf_steps=501, macro_factor=8)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                           max_steps=20000)
        t = _run(dom, illumination.directional(0.5, 0.0), cfg=cfg)
        n = int(t.n_photons)
        np.testing.assert_allclose(
            float(jnp.sum(t.flux_up)) + float(jnp.sum(t.flux_down)), n,
            rtol=1e-4)
        assert int(t.n_bad) == 0


class TestBRDFSurface:
    def test_rpv_hot_spot_and_positive(self):
        import jax.numpy as jnp
        from mcbrat3d_tpu.physics.surface import Surface
        s = Surface.rpv(rho0=0.3, k=0.8, theta=-0.2)
        mu_in = jnp.asarray([-0.6])
        # backscatter (phi_out == phi_in + pi is forward; hot spot at
        # phi_out == phi_in with matching angles)
        r_hot = s.reflectance(jnp.asarray([0.5]), jnp.asarray([0.5]),
                              mu_in, jnp.asarray([0.6]),
                              jnp.asarray([0.0]), jnp.asarray([np.pi]))
        r_fwd = s.reflectance(jnp.asarray([0.5]), jnp.asarray([0.5]),
                              mu_in, jnp.asarray([0.6]),
                              jnp.asarray([0.0]), jnp.asarray([0.0]))
        assert float(r_hot[0]) > 0 and float(r_fwd[0]) > 0

    def test_rpv_transport_conserves(self):
        """RPV surface in the kernel: energy balance still closes (surface
        absorbs 1 - <R>)."""
        from mcbrat3d_tpu.scenes.plane_parallel import make_slab
        dom = make_slab(tau=0.5, ssa=1.0, n_cdf_steps=201)
        s = Surface.rpv(rho0=0.25, k=1.0, theta=-0.1)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                           max_steps=3000, use_russian_roulette=False)
        t = _run(dom, illumination.directional(0.7, 0.0), surface=s, cfg=cfg)
        n = int(t.n_photons)
        up = float(jnp.sum(t.flux_up)) / n
        dn = float(jnp.sum(t.flux_down)) / n
        assert 0 < up < 1 and dn > 0
        assert int(t.n_bad) == 0


@pytest.mark.slow
class TestLandsatScale:
    def test_large_domain_correct_and_macro_wins(self):
        """128x128x64 broken-cloud scene: scatter-tally path stays correct
        and macro majorants sharply reduce steps (clear air + thin cloud)."""
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        rs = np.random.RandomState(3)
        nx = ny = 64
        nz = 32
        tau = np.maximum(0, rs.gamma(2.0, 6.0, (nx, ny)) - 4.0)
        thick_cells = np.where(tau > 0, rs.randint(5, 20, (nx, ny)), 0)
        ext = np.zeros((nx, ny, nz))
        dz = 20.0
        for k in range(nz):
            ext[:, :, k] = np.where(k < thick_cells,
                                    tau / np.maximum(thick_cells * dz, 1), 0)
        tbl = PhaseFunctionTable([PhaseFunction.henyey_greenstein(0.85, 64)],
                                 key=[1.0])
        comp = OpticalComponent("broken cloud", ext, np.full_like(ext, 0.99),
                                np.zeros(ext.shape, np.int32), tbl)
        grid = Grid.regular(nx, ny, nz, 30.0, 30.0, dz)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=2,
                           max_steps=60000)
        src = illumination.directional(0.5, 0.0)
        out = {}
        for mf in (0, 16):
            dom = build_domain(grid, [comp], n_cdf_steps=501, macro_factor=mf)
            t = _run(dom, src, surface=Surface.lambertian(0.2), cfg=cfg)
            n = int(t.n_photons)
            assert int(t.n_bad) == 0
            R = float(jnp.sum(t.flux_up)) / n
            T = float(jnp.sum(t.flux_down)) / n
            A = float(jnp.sum(t.flux_absorbed)) / n
            # closure: up + atm abs + surface-absorbed share of down
            np.testing.assert_allclose(R + A + 0.8 * T, 1.0, atol=0.02)
            out[mf] = (R, int(t.n_steps))
        assert abs(out[0][0] - out[16][0]) < 0.03  # agree on reflectance
        assert out[16][1] < 0.5 * out[0][1]  # macro cuts steps >2x here


class TestTableVsAnalyticSampling:
    def test_inverse_cdf_table_matches_analytic_hg(self):
        """The same HG phase function sampled through the inverse-CDF table
        (all_hg=False) and analytically (all_hg=True) must agree."""
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        g = 0.8
        coeffs = g ** np.arange(1, 129)
        pf_table = PhaseFunction(coefficients=coeffs)   # hg_g=None -> table
        pf_hg = PhaseFunction.henyey_greenstein(g, 128)  # analytic path
        grid = Grid.regular(4, 4, 8, 0.25, 0.25, 0.125)
        ext = np.full((4, 4, 8), 3.0)

        def make(pf):
            comp = OpticalComponent(
                "slab", ext, np.full_like(ext, 0.99),
                np.zeros(ext.shape, np.int32),
                PhaseFunctionTable([pf], key=[1.0]))
            return build_domain(grid, [comp], n_cdf_steps=9001)

        dom_t = make(pf_table)
        dom_a = make(pf_hg)
        assert not dom_t.all_hg and dom_a.all_hg
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8,
                           max_steps=6000)

        def rta(dom, seeds):
            vals = []
            for s in seeds:
                t = _run(dom, illumination.directional(0.6, 0.0), cfg=cfg,
                         seed=s)
                n = int(t.n_photons)
                vals.append([float(jnp.sum(t.flux_up)) / n,
                             float(jnp.sum(t.flux_absorbed)) / n])
            return np.asarray(vals)

        a = rta(dom_a, range(3))
        b = rta(dom_t, range(3, 6))
        sig = (a.std(0, ddof=1) + b.std(0, ddof=1)) / np.sqrt(3) + 1e-4
        assert np.all(np.abs(a.mean(0) - b.mean(0)) < 5 * sig + 0.005), (
            a.mean(0), b.mean(0), sig)
