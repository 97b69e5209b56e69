"""Radiance (local estimation) validation.

Oracles: first-order scattering radiance for thin slabs, reciprocity-style
consistency between the full local estimate and the Iwabuchi
Russian-roulette variant, and surface-reflection radiance for a Lambertian
surface (I = albedo * mu0 * F / pi).
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.phase_function import PhaseFunction
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.local_estimate import (
    IntensityConfig,
    make_intensity_directions,
)


def run_intensity(domain, source, surface, icfg, dirs, cfg, seed=0, batch=0):
    t = run_batch(domain, surface, source, rng.batch_key(seed, batch), cfg,
                  intensity_config=icfg, intensity_dirs=dirs)
    t = t.normalized(domain.grid)
    return t


class TestDirections:
    def test_make_directions(self):
        dirs = make_intensity_directions([1.0, 0.5], [0.0, 90.0])
        d = np.asarray(dirs)
        assert d.shape == (3, 2)
        np.testing.assert_allclose(d[:, 0], [0, 0, 1], atol=1e-7)
        np.testing.assert_allclose(d[2, 1], 0.5, rtol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, rtol=1e-6)

    def test_zero_mu_rejected(self):
        with pytest.raises(ValueError):
            make_intensity_directions([0.0], [0.0])


class TestSingleScatteringOracle:
    @pytest.mark.parametrize("mu_v", [1.0, 0.5])
    def test_thin_isotropic_slab_radiance(self, mu_v):
        """First order: I(mu_v) = ssa * tau * P/(4 pi mu_v) for thin tau,
        normal incidence, per unit incident flux on the horizontal."""
        tau = 0.05
        dom = make_slab(tau=tau, ssa=1.0, nx=2, ny=2, nz=4, n_cdf_steps=501,
                        compute_intensity_tables=True)
        dirs = make_intensity_directions([mu_v], [0.0])
        icfg = IntensityConfig(n_dirs=1, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8,
                           max_steps=2000)
        t = run_intensity(dom, illumination.directional(1.0, 0.0),
                          Surface.lambertian(0.0), icfg, dirs, cfg)
        rad = float(np.mean(np.asarray(t.intensity)[:, :, 0]))
        expect = tau * 1.0 / (4 * np.pi * mu_v)  # P_iso = 1
        n = int(t.n_photons)
        sigma = expect / np.sqrt(tau * n)  # ~1 contribution per tau photons
        assert abs(rad - expect) < 4 * sigma + 0.03 * expect

    def test_hg_forward_vs_backward_asymmetry(self):
        """HG g=0.7: radiance looking up-sun (backscatter) must be much
        smaller than the forward-hemisphere radiance for oblique sun."""
        dom = make_slab(tau=0.1, ssa=1.0, nx=2, ny=2, nz=4, n_cdf_steps=501,
                        phase=PhaseFunction.henyey_greenstein(0.7, 64),
                        compute_intensity_tables=True)
        # Sun from mu0=0.5, phi=0: photons travel along (+0.866, 0, -0.5).
        # Detector direction = the photon's outgoing direction toward TOA:
        # mu=0.5, phi=0 -> (0.866, 0, 0.5): scattering cosine +0.5 (forward
        # hemisphere); mu=0.5, phi=180 -> (-0.866, 0, 0.5): cosine -1
        # (exact backscatter).
        dirs = make_intensity_directions([0.5, 0.5], [0.0, 180.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8, max_steps=2000)
        t = run_intensity(dom, illumination.directional(0.5, 0.0),
                          Surface.lambertian(0.0), icfg, dirs, cfg)
        rad = np.asarray(t.intensity).mean(axis=(0, 1))
        forward, back = rad[0], rad[1]
        hg = lambda c: (1 - 0.7**2) / (1 + 0.7**2 - 2 * 0.7 * c) ** 1.5
        assert forward > 3 * back
        # quantitative ratio check at first order
        np.testing.assert_allclose(forward / back, hg(0.5) / hg(-1.0),
                                   rtol=0.25)


class TestAllHGWithoutTables:
    def test_analytic_hg_radiance_without_forward_tables(self):
        """All-HG domains need no tabulated forward tables: the estimator
        evaluates HG analytically. Same seed => identical photon paths, so
        the only difference vs the tabulated domain is table interpolation
        error (tight tolerance)."""
        kw = dict(tau=0.5, ssa=1.0, nx=2, ny=2, nz=4, n_cdf_steps=501,
                  phase=PhaseFunction.henyey_greenstein(0.7, 64))
        dom_nt = make_slab(**kw)  # no intensity tables
        dom_t = make_slab(compute_intensity_tables=True, **kw)
        assert dom_nt.all_hg
        assert dom_nt.tables.forward_orig.shape[1] == 1
        dirs = make_intensity_directions([0.8], [30.0])
        icfg = IntensityConfig(n_dirs=1, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=2000, use_pallas="off")
        src = illumination.directional(0.5, 0.0)
        t_nt = run_intensity(dom_nt, src, Surface.lambertian(0.0), icfg,
                             dirs, cfg)
        t_t = run_intensity(dom_t, src, Surface.lambertian(0.0), icfg,
                            dirs, cfg)
        rad_nt = np.asarray(t_nt.intensity)
        assert float(rad_nt.mean()) > 0
        np.testing.assert_allclose(rad_nt, np.asarray(t_t.intensity),
                                   rtol=5e-3, atol=1e-7)

    def test_sharded_all_hg_without_tables_runs(self):
        """run_batch_sharded applies the same all-HG exemption."""
        import jax

        from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
        dom = make_slab(tau=0.2, ssa=1.0, nx=2, ny=2, nz=4, n_cdf_steps=201,
                        phase=PhaseFunction.henyey_greenstein(0.5, 32))
        dirs = make_intensity_directions([1.0], [0.0])
        icfg = IntensityConfig(n_dirs=1, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 8, photons_per_lane=2,
                           max_steps=1000, use_pallas="off")
        t = run_batch_sharded(dom, Surface.lambertian(0.0),
                              illumination.directional(1.0, 0.0),
                              seed=0, global_batch=0, config=cfg,
                              mesh=make_mesh(), intensity_config=icfg,
                              intensity_dirs=dirs)
        assert float(np.asarray(t.intensity).sum()) > 0

    def test_ineligibility_reasons_with_none_dirs(self):
        """The forced-megakernel diagnostic must name a missing-dirs reason,
        not crash with AttributeError on dirs.shape."""
        from mcbrat3d_tpu.transport import pallas_kernel as _pk
        dom = make_slab(tau=0.2, ssa=1.0, nx=2, ny=2, nz=4, n_cdf_steps=201)
        icfg = IntensityConfig(n_dirs=1, use_russian_roulette=False)
        reasons = _pk.intensity_ineligibility_reasons(
            dom, Surface.lambertian(0.0), illumination.directional(1.0, 0.0),
            False, 0, False, icfg, None, False)
        assert any("intensity_dirs is None" in r for r in reasons)


class TestSurfaceRadiance:
    def test_lambertian_surface_radiance(self):
        """tau ~ 0: TOA radiance = albedo * mu0 * F / pi in all directions."""
        dom = make_slab(tau=1e-6, ssa=1.0, nx=2, ny=2, nz=2, n_cdf_steps=101,
                        compute_intensity_tables=True)
        dirs = make_intensity_directions([1.0, 0.5], [0.0, 45.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8, max_steps=500)
        mu0, albedo = 0.7, 0.4
        t = run_intensity(dom, illumination.directional(mu0, 0.0),
                          Surface.lambertian(albedo), icfg, dirs, cfg)
        rad = np.asarray(t.intensity).mean(axis=(0, 1))
        # per-photon normalization: incident flux on horizontal = 1 photon
        # per column; reflected radiance = albedo / pi (isotropic)
        expect = albedo / np.pi
        np.testing.assert_allclose(rad, expect, rtol=0.05)

    def test_rpv_surface_radiance_analytic(self):
        """tau ~ 0, RPV surface: every photon reflects exactly once, so
        the TOA radiance toward detector d is ANALYTIC,
        I(d) = Rf(in -> d) / pi per unit incident on the horizontal --
        with the BRDF evaluated toward the DETECTOR direction (the
        anisotropy/hotspot the sampled-bounce weight cannot carry).
        Reference extension point: src/surfaceProperties.f95:119-147."""
        from mcbrat3d_tpu.physics.surface import rpv_reflectance

        dom = make_slab(tau=1e-6, ssa=1.0, nx=2, ny=2, nz=2,
                        n_cdf_steps=101, compute_intensity_tables=True)
        # detectors in the forward and BACKSCATTER azimuths (dphi 0/180)
        mus_d = [0.8, 0.8, 0.5]
        phis_d = [0.0, 180.0, 90.0]
        dirs = make_intensity_directions(mus_d, phis_d)
        icfg = IntensityConfig(n_dirs=3, use_russian_roulette=False)
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8,
                           max_steps=500)
        mu0 = 0.7
        params = np.asarray([0.25, 0.8, -0.15], np.float32)
        sfc = Surface.rpv(*params)
        t = run_intensity(dom, illumination.directional(mu0, 0.0), sfc,
                          icfg, dirs, cfg)
        rad = np.asarray(t.intensity).mean(axis=(0, 1))
        # incoming propagation azimuth: solar_azimuth = 0 -> phi_in = 0
        for i, (mu_d, phi_d) in enumerate(zip(mus_d, phis_d)):
            rf = float(rpv_reflectance(params, -mu0, mu_d, 0.0,
                                       np.deg2rad(phi_d)))
            np.testing.assert_allclose(rad[i], rf / np.pi, rtol=0.05,
                                       err_msg=f"dir {i}")
        # the anisotropy must actually discriminate the azimuths
        assert abs(rad[0] - rad[1]) > 0.1 * max(rad[0], rad[1])


class TestIwabuchiRR:
    def test_rr_unbiased_vs_full(self):
        """The Iwabuchi Russian-roulette estimator must agree with the full
        transmittance estimator in expectation."""
        dom = make_slab(tau=2.0, ssa=0.99, nx=2, ny=2, nz=4, n_cdf_steps=501,
                        phase=PhaseFunction.henyey_greenstein(0.6, 64),
                        compute_intensity_tables=True)
        dirs = make_intensity_directions([0.8], [30.0])
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4, max_steps=3000)

        def mean_rad(icfg, seeds):
            vals = []
            for s in seeds:
                t = run_intensity(dom, illumination.directional(0.6, 0.0),
                                  Surface.lambertian(0.0), icfg, dirs, cfg,
                                  seed=s)
                vals.append(float(np.mean(np.asarray(t.intensity))))
            return np.mean(vals), np.std(vals, ddof=1) / np.sqrt(len(vals))

        full, fe = mean_rad(IntensityConfig(n_dirs=1,
                                            use_russian_roulette=False),
                            seeds=range(4))
        rr, re = mean_rad(IntensityConfig(n_dirs=1, use_russian_roulette=True,
                                          zeta_min=0.3),
                          seeds=range(4, 8))
        sigma = np.sqrt(fe**2 + re**2) + 1e-6
        assert abs(full - rr) < 4 * sigma + 0.05 * full, (full, rr, sigma)


class TestContributionCapping:
    def test_capping_preserves_total(self):
        """Excess redistribution conserves the image-integrated radiance
        while flattening spikes (reference behavior of
        limitIntensityContributions)."""
        from mcbrat3d_tpu.physics.phase_function import PhaseFunction
        dom = make_slab(tau=1.0, ssa=1.0, nx=4, ny=4, nz=4, n_cdf_steps=501,
                        phase=PhaseFunction.henyey_greenstein(0.85, 64),
                        compute_intensity_tables=True)
        dirs = make_intensity_directions([0.9], [0.0])
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4, max_steps=2000)
        base = IntensityConfig(n_dirs=1, use_russian_roulette=False)
        capped = IntensityConfig(n_dirs=1, use_russian_roulette=False,
                                 limit_contributions=True,
                                 max_contribution=0.005)
        src = illumination.directional(0.9, 0.0)
        t0 = run_intensity(dom, src, Surface.lambertian(0.0), base, dirs, cfg)
        t1 = run_intensity(dom, src, Surface.lambertian(0.0), capped, dirs,
                           cfg)
        i0 = np.asarray(t0.intensity)[:, :, 0]
        i1 = np.asarray(t1.intensity)[:, :, 0]
        # totals match (excess fully redistributed)
        np.testing.assert_allclose(i1.sum(), i0.sum(), rtol=1e-3)
        # identical streams, so without capping the fields are identical;
        # with a tight cap the peak pixel must not increase
        assert i1.max() <= i0.max() + 1e-6
