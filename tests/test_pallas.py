"""Pallas megakernel tests (CPU interpreter mode).

The megakernel (transport/pallas_kernel.py) must be statistically
indistinguishable from the XLA wave kernel -- same physics, different RNG
streams -- and must honor quotas, determinism, and its eligibility envelope.
Hardware performance is covered by bench.py; these tests run the kernel
through the Pallas interpreter so CI needs no TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.pallas_kernel import (
    PallasConfig,
    config_for,
    pallas_eligible,
    run_batch_pallas,
)


@pytest.fixture(scope="module")
def step_cloud():
    return make_step_cloud(ssa=0.99, n_cdf_steps=201)


SMALL = PallasConfig(rows=16, block_rows=8, steps_per_call=32,
                     max_steps=6000, interpret=True)


class TestPallasTransport:
    def test_energy_conservation_no_rr(self, step_cloud):
        """Without Russian roulette every started photon's weight must be
        fully accounted: with surface albedo rho the balance is
        R + (1 - rho) * T + A == 1 exactly (f32 noise); the surface
        re-injects rho * T which is re-counted downstream, same as the
        reference's accounting."""
        rho = 0.3
        fu, fd, vol, n, n_bad, _ = run_batch_pallas(
            step_cloud, Surface.lambertian(rho),
            illumination.directional(0.5, 0.0),
            rng.batch_key(3, 0), SMALL, photons_per_lane=2,
            use_russian_roulette=False)
        n = float(n)
        balance = float(fu.sum() + (1 - rho) * fd.sum() + vol.sum()) / n
        assert n == 16 * 128 * 2
        assert int(n_bad) == 0
        assert abs(balance - 1.0) < 2e-4

    def test_matches_xla_kernel_statistically(self, step_cloud):
        """Pixel-level fluxes agree with the XLA wave kernel within MC
        noise at equal photon counts (different RNG streams)."""
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.2)
        n_p = 0
        fu_p = fd_p = 0.0
        for b in range(2):
            fu, fd, vol, ns, nb, _ = run_batch_pallas(
                step_cloud, sfc, src, rng.batch_key(0, b), SMALL,
                photons_per_lane=8)
            fu_p = fu_p + np.asarray(fu)
            fd_p = fd_p + np.asarray(fd)
            n_p += int(ns)
        fu_p, fd_p = fu_p / n_p, fd_p / n_p

        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=16,
                           max_steps=6000, tail_compaction=False,
                           use_pallas="off")
        t = run_batch(step_cloud, sfc, src, rng.batch_key(1, 0), cfg)
        n_x = int(t.n_photons)
        fu_x = np.asarray(t.flux_up) / n_x
        fd_x = np.asarray(t.flux_down) / n_x

        for a, b_ in ((fu_p, fu_x), (fd_p, fd_x)):
            sigma = np.sqrt(a / n_p + b_ / n_x + 1e-12)
            z = np.abs(a - b_) / np.maximum(sigma, 1e-9)
            assert z.max() < 5.0, z.max()

    def test_deterministic_in_key(self, step_cloud):
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.0)
        out1 = run_batch_pallas(step_cloud, sfc, src, rng.batch_key(7, 1),
                                SMALL, photons_per_lane=2)
        out2 = run_batch_pallas(step_cloud, sfc, src, rng.batch_key(7, 1),
                                SMALL, photons_per_lane=2)
        out3 = run_batch_pallas(step_cloud, sfc, src, rng.batch_key(7, 2),
                                SMALL, photons_per_lane=2)
        np.testing.assert_array_equal(np.asarray(out1[0]),
                                      np.asarray(out2[0]))
        assert not np.array_equal(np.asarray(out1[0]), np.asarray(out3[0]))

    def test_n_photons_clamp(self, step_cloud):
        """The traced n_photons must limit started photons exactly."""
        fu, fd, vol, n, _, _ = run_batch_pallas(
            step_cloud, Surface.lambertian(0.0),
            illumination.directional(1.0, 0.0),
            rng.batch_key(0, 0), SMALL, photons_per_lane=2, n_photons=777)
        assert int(n) == 777

    def test_flux_source(self, step_cloud):
        """mu = -sqrt(u) source runs and conserves energy."""
        fu, fd, vol, n, n_bad, _ = run_batch_pallas(
            step_cloud, Surface.lambertian(0.0), illumination.flux(),
            rng.batch_key(2, 0), SMALL, photons_per_lane=2,
            use_russian_roulette=False)
        total = float(fu.sum() + fd.sum() + vol.sum())
        assert abs(total / float(n) - 1.0) < 2e-4
        assert int(n_bad) == 0


class TestEligibility:
    def test_step_cloud_eligible(self, step_cloud):
        assert pallas_eligible(
            step_cloud, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)

    def test_ineligible_cases(self, step_cloud):
        sfc = Surface.lambertian(0.0)
        src = illumination.directional(0.5, 0.0)
        base = dict(lw_mode=False, compute_intensity=False,
                    record_scattering_orders=0, use_ray_tracing=False)
        assert not pallas_eligible(step_cloud, sfc, src,
                                   **{**base, "lw_mode": True})
        assert not pallas_eligible(step_cloud, sfc, src,
                                   **{**base, "use_ray_tracing": True})
        assert not pallas_eligible(step_cloud, sfc, src,
                                   **{**base, "compute_intensity": True})
        # spotlight became an in-kernel source in round 3
        spot = illumination.spotlight(0.5, 0.0, 0.5, 0.5)
        assert pallas_eligible(step_cloud, sfc, spot, **base)
        assert not pallas_eligible(step_cloud, sfc, src,
                                   **{**base,
                                      "record_scattering_orders": 2})

    def test_config_for_folds_lanes(self):
        pcfg, ppl = config_for(n_lanes=1 << 17, photons_per_lane=8,
                               max_steps=1000)
        assert pcfg.rows == 512
        assert pcfg.rows * 128 * ppl >= (1 << 17) * 8
        pcfg2, ppl2 = config_for(n_lanes=1 << 10, photons_per_lane=4,
                                 max_steps=1000)
        assert pcfg2.rows == 8
        assert pcfg2.rows % pcfg2.block_rows == 0


class TestMacroMajorant:
    def test_macro_matches_global_statistically(self):
        """Two-level (macro-block) Woodcock must produce the same physics
        as the global majorant -- null collisions are statistically
        transparent (same re-design as the XLA kernel's use_macro path)."""
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.0)
        doms = (make_step_cloud(ssa=0.99, n_cdf_steps=201),
                make_step_cloud(ssa=0.99, n_cdf_steps=201, macro_factor=8))
        results = []
        for dom in doms:
            fu = 0.0
            n = 0
            for b in range(2):
                out = run_batch_pallas(dom, sfc, src, rng.batch_key(5, b),
                                       SMALL, photons_per_lane=8)
                fu = fu + np.asarray(out[0])
                n += int(out[3])
                assert int(out[4]) == 0
            results.append(fu / n)
        a, b_ = results
        sigma = np.sqrt(a / n + b_ / n + 1e-12)
        z = np.abs(a - b_) / np.maximum(sigma, 1e-9)
        assert z.max() < 5.0, z.max()
        # macro run should use FEWER wave steps (the point of the majorant)


class TestPipelineVariants:
    """The debug/A-B pipelines must agree with the production path."""

    @pytest.mark.parametrize("variant", [
        dict(bf16=False),                       # exact all-f32 pipeline
        dict(debug_parts="all,oldgather"),      # transposed-layout gather
        dict(debug_parts="all,oldtally"),       # j-major tally
    ])
    def test_variant_matches_default(self, step_cloud, variant):
        import dataclasses

        base = dict(rows=8, block_rows=8, steps_per_call=32,
                    max_steps=4096, interpret=True)
        ref_cfg = PallasConfig(**base)
        var_cfg = PallasConfig(**{**base, **variant})
        key = rng.batch_key(5, 0)
        ref = run_batch_pallas(step_cloud, Surface.lambertian(0.2),
                               illumination.directional(0.5, 0.0),
                               key, ref_cfg, 4)
        var = run_batch_pallas(step_cloud, Surface.lambertian(0.2),
                               illumination.directional(0.5, 0.0),
                               key, var_cfg, 4)
        assert int(ref[3]) == int(var[3])  # same photons started
        if "bf16" in variant or "oldgather" in variant.get(
                "debug_parts", ""):
            # variants that change the RECORD QUANTIZATION (the f32
            # pipeline, and the one-hot paths' bf16 hi/lo split vs the
            # dynamic-gather default's exact f32 rows): a photon whose
            # null-collision test lands within the quantization band
            # takes a DIFFERENT branch and its whole trajectory
            # diverges (seed-dependent; a handful of photons per 4k
            # batch). Totals must still agree to a few photon weights;
            # per-pixel near-bitwise comparison only holds for variants
            # sharing the record tables (below).
            n = float(ref[3])
            for i, name in ((0, "flux_up"), (1, "flux_down")):
                a = float(np.asarray(ref[i]).sum())
                b = float(np.asarray(var[i]).sum())
                assert abs(a - b) <= max(4.0, 0.003 * n), (
                    f"{name}: {a} vs {b}")
        else:
            # identical streams AND identical bf16 tables; only
            # summation order / split arithmetic differ
            for i, name in ((0, "flux_up"), (1, "flux_down"), (2, "vol")):
                np.testing.assert_allclose(np.asarray(var[i]),
                                           np.asarray(ref[i]),
                                           atol=5e-4, rtol=1e-3,
                                           err_msg=f"{name} ({variant})")


class TestKernelConfigDebugParts:
    """KernelConfig.pallas_debug_parts must reach PallasConfig.debug_parts
    through the run_batch-compatible entry (the measurement-harness A/B
    channel; tools/exp_hif.py drives hardware A/Bs through it)."""

    def test_threads_to_pallas_config(self, step_cloud):
        from mcbrat3d_tpu.transport.pallas_kernel import (
            run_batch_pallas_tallies)

        key = rng.batch_key(11, 0)
        out = []
        for parts in ("all", "all,oldtally"):
            cfg = KernelConfig(n_lanes=1024, photons_per_lane=4,
                               max_steps=4096, pallas_debug_parts=parts)
            t = run_batch_pallas_tallies(
                step_cloud, Surface.lambertian(0.2),
                illumination.directional(0.5, 0.0), key, cfg,
                interpret=True)
            out.append(t)
        a, b = out
        assert int(a.n_photons) == int(b.n_photons)
        # oldtally shares streams and record tables with the default:
        # only the tally contraction layout differs, so per-pixel values
        # agree to f32 summation noise (proves the knob engaged a real
        # kernel variant AND that the variant is correct end-to-end)
        np.testing.assert_allclose(np.asarray(b.flux_up),
                                   np.asarray(a.flux_up),
                                   atol=5e-4, rtol=1e-3)


class TestMegakernelIntensity:
    """In-kernel local estimation (exact non-RR estimator) must match the
    XLA DDA path statistically (same physics, different streams)."""

    def test_matches_xla_intensity(self):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)

        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        dirs = make_intensity_directions([1.0, 0.5], [0.0, 0.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(4, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        iref = np.asarray(t.intensity) / int(t.n_photons)
        cfg2 = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                            max_steps=20_000, use_pallas="on")
        t2 = run_batch(dom, Surface.lambertian(0.2),
                       illumination.directional(0.5, 0.0),
                       rng.batch_key(4, 1), cfg2,
                       intensity_config=icfg, intensity_dirs=dirs)
        imk = np.asarray(t2.intensity) / int(t2.n_photons)
        assert t2.intensity.shape == iref.shape == (32, 1, 2)
        for d in range(2):
            a, b = iref[:, :, d].mean(), imk[:, :, d].mean()
            # domain-mean radiance within ~4 sigma of the batch MC noise
            assert b == pytest.approx(a, rel=0.06), f"dir {d}"
        # thick half radiates more than the thin half (nadir view)
        assert imk[16:, :, 0].mean() > imk[:16, :, 0].mean()

    def test_downward_direction_contributes_zero(self):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig

        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False)
        import jax.numpy as jnp
        dirs = jnp.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, -1.0]],
                           jnp.float32)
        # downward dirs fail the host-side mu-floor validation, which
        # gates the in-kernel path (traced dirs are refused outright)
        assert not pk.dirs_mu_floor_ok(icfg, dirs)
        ok = pk.pallas_intensity_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), lw_mode=False,
            record_scattering_orders=0, use_ray_tracing=False,
            icfg=icfg, dirs=dirs,
            dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        assert not ok
        # a shallow upward direction below pallas_min_mu is also rejected
        # (its truncated march would silently zero its contribution)
        import jax.numpy as jnp2
        shallow = jnp2.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 0.05]],
                               jnp2.float32)
        assert not pk.dirs_mu_floor_ok(icfg, shallow)
        # while compliant directions pass
        good = jnp2.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 0.5]],
                            jnp2.float32)
        assert pk.dirs_mu_floor_ok(icfg, good)


class TestWideDomainEnvelope:
    """Cells beyond the old 16384 bound (the I3RC radar cloud shape,
    640 x 54; reference: Domain-Files/i3rcRadarCloud.f95:28-30) run the
    megakernel with a wider hi factor and a capped block size."""

    def test_radar_shaped_domain_matches_xla(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        from mcbrat3d_tpu.transport import pallas_kernel as pk

        nx, ny, nz = 640, 1, 54  # 34560 cells > 16384
        rs = np.random.RandomState(3)
        ext = rs.rand(nx, ny, nz) * 0.004 * (rs.rand(nx, ny, nz) > 0.5)
        grid = Grid.regular(nx, ny, nz, 50.0, 32000.0, 45.0)
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
        comp = OpticalComponent("radar", ext, np.full_like(ext, 0.99),
                                np.zeros(ext.shape, np.int32), table)
        dom = build_domain(grid, [comp], macro_factor=8, n_cdf_steps=101)
        assert pk.pallas_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), lw_mode=False,
            compute_intensity=False, record_scattering_orders=0,
            use_ray_tracing=False)

        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(2, 0), cfg)
        pcfg = PallasConfig(rows=16, block_rows=16, steps_per_call=64,
                            max_steps=20_000, interpret=True)
        out = run_batch_pallas(dom, Surface.lambertian(0.2),
                               illumination.directional(0.5, 0.0),
                               rng.batch_key(2, 1), pcfg, 4)
        fu, fd, vol, n, nbad, _ = out[:6]
        n = int(n)
        assert n == cfg.photons_per_batch
        assert int(nbad) == 0
        for a, b, name in ((fu, t.flux_up, "R"), (fd, t.flux_down, "T")):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / int(t.n_photons)
            sigma = 2.0 * np.sqrt(0.25 / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        # volume absorption shape covers all 34560 cells
        assert vol.shape == (nx, ny, nz)
        assert float(np.asarray(vol).sum()) > 0


class TestTabulatedPhaseFunctions:
    """Non-HG (inverse-CDF) phase functions in the megakernel: the angle
    table is gathered in-kernel (bf16 hi/lo split + lerp delta), matching
    sample_scattering_cos (reference: computeScatteringAngle,
    Integrators/monteCarloRadiativeTransfer.f95:1594-1621)."""

    def _domain(self, two_entries=False):
        from mcbrat3d_tpu.domain.domain import build_domain
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        from mcbrat3d_tpu.scenes.step_cloud import step_cloud_scene

        grid, comps, temps = step_cloud_scene(ssa=0.99, n_legendre=64)
        mix = np.array([0.8 * 0.7 ** (m + 1) + 0.2 * 0.3 ** (m + 1)
                        for m in range(64)])
        if two_entries:
            sharp = np.array([0.9 ** (m + 1) for m in range(64)])
            comps[0].phase_function_table = PhaseFunctionTable(
                [PhaseFunction(coefficients=mix),
                 PhaseFunction(coefficients=sharp)], key=[1.0, 2.0])
            pfi = np.zeros(comps[0].extinction.shape, np.int32)
            pfi[16:] = 1  # thick half uses the sharper function
            comps[0].phase_function_index = pfi
        else:
            comps[0].phase_function_table.phase_functions[0] = \
                PhaseFunction(coefficients=mix)
        return build_domain(grid, comps, macro_factor=8, n_cdf_steps=501)

    @pytest.mark.parametrize("two_entries", [False, True])
    def test_matches_xla(self, two_entries):
        from mcbrat3d_tpu.transport import pallas_kernel as pk

        dom = self._domain(two_entries)
        assert not dom.all_hg
        assert pk.pallas_eligible(
            dom, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0), False, False, 0, False)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, Surface.lambertian(0.0),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(5, 0), cfg)
        n = int(t.n_photons)
        pcfg = PallasConfig(rows=16, block_rows=16, steps_per_call=64,
                            max_steps=20_000, interpret=True)
        out = run_batch_pallas(dom, Surface.lambertian(0.0),
                               illumination.directional(0.5, 0.0),
                               rng.batch_key(5, 1), pcfg, 4)
        n2 = int(out[3])
        assert n2 == n
        sig = 2 * np.sqrt(0.25 / n)
        for i, ref, name in ((0, t.flux_up, "R"), (1, t.flux_down, "T")):
            a = float(np.asarray(out[i]).sum()) / n2
            b = float(np.asarray(ref).sum()) / n
            assert a == pytest.approx(b, abs=4 * sig), name

    def test_energy_conservation_no_rr(self):
        dom = self._domain(two_entries=True)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = run_batch_pallas(dom, Surface.lambertian(0.2),
                               illumination.directional(0.5, 0.0),
                               rng.batch_key(0, 0), pcfg, 2,
                               use_russian_roulette=False)
        fu, fd, vol, n, nbad, _ = out[:6]
        n = int(n)
        bal = (float(np.asarray(fu).sum()) + 0.8 * float(np.asarray(fd).sum())
               + float(np.asarray(vol).sum())) / n
        assert int(nbad) == 0
        assert bal == pytest.approx(1.0, abs=2e-3)

    def test_reference_default_table_size_eligible(self):
        """9001-step tables with several Reff entries (the reference's
        nPhaseIntervals default) fit the inverse-table envelope and match
        the XLA kernel with per-cell entry routing."""
        from mcbrat3d_tpu.domain.domain import build_domain
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        from mcbrat3d_tpu.scenes.step_cloud import step_cloud_scene
        from mcbrat3d_tpu.transport import pallas_kernel as pk

        grid, comps, temps = step_cloud_scene(ssa=0.99, n_legendre=64)
        pfs = [PhaseFunction(coefficients=np.array(
            [(0.5 + 0.08 * i) ** (m + 1) for m in range(64)]))
            for i in range(5)]
        comps[0].phase_function_table = PhaseFunctionTable(
            pfs, key=list(range(5)))
        pfi = np.zeros(comps[0].extinction.shape, np.int32)
        pfi[8:16] = 2
        pfi[16:] = 4
        comps[0].phase_function_index = pfi
        dom = build_domain(grid, comps, macro_factor=8, n_cdf_steps=9001)
        assert dom.tables.inverse.size == 5 * 9001
        assert pk.pallas_eligible(
            dom, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0), False, False, 0, False)
        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=4,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, Surface.lambertian(0.0),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(5, 0), cfg)
        n = int(t.n_photons)
        pcfg = PallasConfig(rows=16, block_rows=16, steps_per_call=64,
                            max_steps=20_000, interpret=True)
        out = run_batch_pallas(dom, Surface.lambertian(0.0),
                               illumination.directional(0.5, 0.0),
                               rng.batch_key(5, 1), pcfg, 4)
        n2 = int(out[3])
        sig = 2 * np.sqrt(0.25 / n)
        for i, ref in ((0, t.flux_up), (1, t.flux_down)):
            a = float(np.asarray(out[i]).sum()) / n2
            b = float(np.asarray(ref).sum()) / n
            assert a == pytest.approx(b, abs=4 * sig)


class TestMultiComponent:
    """Gas + cloud (+ Rayleigh) domains stay on the in-kernel fast path.

    The megakernel uses the scattering-coefficient formulation (absorb by
    the cell's effective ssa, select the scattering component by scattering
    fractions) while the XLA path mirrors the reference's
    extinction-fraction selection + per-component ssa
    (reference: Integrators/monteCarloRadiativeTransfer.f95:759-771); the
    two are identical in expectation, so pixel fluxes must agree within MC
    noise.
    """

    @pytest.fixture(scope="class")
    def multi3(self):
        from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud_multi
        return make_step_cloud_multi(ssa=0.99, n_components=3,
                                     gas_ext=0.002, rayleigh_ext=0.001,
                                     n_cdf_steps=201)

    def test_eligible(self, multi3):
        assert multi3.n_components == 3
        assert pallas_eligible(
            multi3, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)

    def test_four_components_ineligible(self):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.scenes.step_cloud import step_cloud_scene
        from mcbrat3d_tpu.domain.domain import OpticalComponent, build_domain
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        grid, comps, _ = step_cloud_scene(ssa=0.99)
        nz = grid.shape[2]
        tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
        extra = [OpticalComponent(f"aero{i}", np.full((1, 1, nz), 1e-3),
                                  np.full((1, 1, nz), 0.5),
                                  np.zeros((1, 1, nz), np.int32), tbl)
                 for i in range(3)]
        dom4 = build_domain(grid, comps + extra, n_cdf_steps=201)
        reasons = pk.ineligibility_reasons(
            dom4, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        assert any("n_components" in r for r in reasons)

    def test_energy_conservation_no_rr(self, multi3):
        rho = 0.2
        fu, fd, vol, n, n_bad, _ = run_batch_pallas(
            multi3, Surface.lambertian(rho),
            illumination.directional(0.5, 0.0),
            rng.batch_key(3, 0), SMALL, photons_per_lane=2,
            use_russian_roulette=False)
        n = float(n)
        balance = float(fu.sum() + (1 - rho) * fd.sum() + vol.sum()) / n
        assert int(n_bad) == 0
        assert abs(balance - 1.0) < 2e-4

    def test_matches_xla_statistically(self, multi3):
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.2)
        n_p = 0
        fu_p = fd_p = ab_p = 0.0
        for b in range(2):
            fu, fd, vol, ns, nb, _ = run_batch_pallas(
                multi3, sfc, src, rng.batch_key(0, b), SMALL,
                photons_per_lane=8)
            fu_p = fu_p + np.asarray(fu)
            fd_p = fd_p + np.asarray(fd)
            ab_p = ab_p + np.asarray(vol).sum(axis=2)
            n_p += int(ns)
        fu_p, fd_p, ab_p = fu_p / n_p, fd_p / n_p, ab_p / n_p

        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=16,
                           max_steps=6000, tail_compaction=False,
                           use_pallas="off")
        t = run_batch(multi3, sfc, src, rng.batch_key(1, 0), cfg)
        n_x = int(t.n_photons)
        fu_x = np.asarray(t.flux_up) / n_x
        fd_x = np.asarray(t.flux_down) / n_x
        ab_x = np.asarray(t.flux_absorbed) / n_x

        for a, b_ in ((fu_p, fu_x), (fd_p, fd_x), (ab_p, ab_x)):
            sigma = np.sqrt(a / n_p + b_ / n_x + 1e-12)
            z = np.abs(a - b_) / np.maximum(sigma, 1e-9)
            assert z.max() < 5.0, z.max()

    def test_tabulated_multi_matches_xla(self):
        """Two components with a true (Legendre Rayleigh) phase function:
        the in-kernel inverse-CDF lookup must resolve the component's
        GLOBAL stacked phase row (offsets[c] + pfi)."""
        from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud_multi
        dom = make_step_cloud_multi(ssa=0.99, n_components=3,
                                    gas_ext=0.002, rayleigh_ext=0.004,
                                    analytic=False, n_cdf_steps=201)
        assert not dom.all_hg
        assert pallas_eligible(
            dom, Surface.lambertian(0.0),
            illumination.directional(0.5, 0.0),
            lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.0)
        fu, fd, vol, ns, nb, _ = run_batch_pallas(
            dom, sfc, src, rng.batch_key(0, 0), SMALL,
            photons_per_lane=8)
        n_p = int(ns)
        fu_p = np.asarray(fu) / n_p
        fd_p = np.asarray(fd) / n_p

        cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                           max_steps=6000, tail_compaction=False,
                           use_pallas="off")
        t = run_batch(dom, sfc, src, rng.batch_key(1, 0), cfg)
        n_x = int(t.n_photons)
        fu_x = np.asarray(t.flux_up) / n_x
        fd_x = np.asarray(t.flux_down) / n_x
        for a, b_ in ((fu_p, fu_x), (fd_p, fd_x)):
            sigma = np.sqrt(a / n_p + b_ / n_x + 1e-12)
            z = np.abs(a - b_) / np.maximum(sigma, 1e-9)
            assert z.max() < 5.0, z.max()


class TestLWEmission:
    """In-kernel BBEmission: Walker-alias voxel sampling, surface/atmosphere
    split, and emission pre-credits (reference:
    src/monteCarloIllumination.f95:431-522,
    Integrators/monteCarloRadiativeTransfer.f95:504-508)."""

    @pytest.fixture(scope="class")
    def lw_setup(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                                   emission_weighting)
        nx, ny, nz = 8, 4, 8
        rs = np.random.RandomState(0)
        grid = Grid.regular(nx, ny, nz, 0.5, 0.5, 0.25)
        tbl = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
        gas_tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
        cld = rs.rand(nx, ny, nz) * 6.0
        comp_c = OpticalComponent("cloud", cld, np.full_like(cld, 0.6),
                                  np.zeros(cld.shape, np.int32), tbl)
        gas = np.full((1, 1, nz), 0.5)
        comp_g = OpticalComponent("gas", gas, np.zeros_like(gas),
                                  np.zeros(gas.shape, np.int32), gas_tbl)
        comps = [comp_c, comp_g]
        temps = 250.0 + 40.0 * rs.rand(nx, ny, nz)
        domain = build_domain(grid, comps, temps=temps, n_cdf_steps=201)
        kabs = absorption_coefficient(comps, grid)
        w = emission_weighting(grid, temps, kabs, 290.0, 0.95, 10.0)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        return domain, source

    def test_eligible_and_dispatches(self, lw_setup):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        domain, source = lw_setup
        assert pk.pallas_eligible(
            domain, Surface.lambertian(0.05), source,
            lw_mode=True, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)

    def test_alias_table_distribution_exact(self):
        """Walker alias tables reconstruct the voxel distribution to f64
        rounding (P(v) = (prob[v] + sum_{alias[j]==v}(1-prob[j])) / n)."""
        from mcbrat3d_tpu.sources.illumination import _walker_alias
        rs = np.random.RandomState(1)
        p = rs.rand(500) ** 3
        p /= p.sum()
        prob, alias = _walker_alias(p)
        rec = prob.copy()
        for j in range(p.size):
            if alias[j] != j:
                rec[alias[j]] += 1.0 - prob[j]
        np.testing.assert_allclose(rec / p.size, p, atol=1e-14)

    def test_emission_histogram_matches_target(self):
        """Near-transparent domain: the volume tally is (minus) the
        emission histogram, which must match the target distribution."""
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        nx, ny, nz = 8, 4, 8
        rs = np.random.RandomState(0)
        grid = Grid.regular(nx, ny, nz, 0.5, 0.5, 0.25)
        tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
        ext = np.full((nx, ny, nz), 1e-6)
        comp = OpticalComponent("thin", ext, np.ones_like(ext),
                                np.zeros(ext.shape, np.int32), tbl)
        domain = build_domain(grid, [comp], n_cdf_steps=201)
        p = rs.rand(nz, ny, nx) ** 2
        p /= p.sum()
        cdf = np.cumsum(p.reshape(-1))
        cdf[-1] = 1.0
        source = illumination.emission(cdf, 1.0, grid.shape)
        cfg = KernelConfig(n_lanes=2048, photons_per_lane=32,
                           max_steps=8000, use_pallas="on",
                           tail_compaction=False, lw_mode=True)
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(0, 0), cfg)
        n = float(t.n_photons)
        est = -np.asarray(t.volume_absorption) / n
        pk_ = p.transpose(2, 1, 0)
        sig = np.sqrt(pk_ * (1 - pk_) / n) + 1e-9
        assert np.abs((est - pk_) / sig).max() < 5.0
        assert abs(est.sum() - 1.0) < 1e-3

    def test_matches_xla_lw_statistically(self, lw_setup):
        domain, source = lw_setup
        sfc = Surface.lambertian(0.05)
        cfgP = KernelConfig(n_lanes=4096, photons_per_lane=16,
                            max_steps=6000, use_pallas="on",
                            tail_compaction=False, lw_mode=True)
        cfgX = KernelConfig(n_lanes=4096, photons_per_lane=16,
                            max_steps=6000, use_pallas="off",
                            tail_compaction=False, lw_mode=True)
        tP = run_batch(domain, sfc, source, rng.batch_key(0, 0), cfgP)
        tX = run_batch(domain, sfc, source, rng.batch_key(1, 0), cfgX)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        for aP, aX in ((tP.flux_up, tX.flux_up),
                       (tP.flux_down, tX.flux_down)):
            a = np.asarray(aP) / nP
            b = np.asarray(aX) / nX
            sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
            assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 5.5
        # net volume absorption (absorption minus emission pre-credits):
        # domain-total comparison (per-cell net values straddle zero)
        vP = float(np.asarray(tP.volume_absorption).sum()) / nP
        vX = float(np.asarray(tX.volume_absorption).sum()) / nX
        assert abs(vP - vX) < 0.02


class TestSpotlightSource:
    def test_matches_xla(self, step_cloud):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        src = illumination.spotlight(0.8, 30.0, 0.4, 0.7)
        sfc = Surface.lambertian(0.2)
        assert pk.pallas_eligible(
            step_cloud, sfc, src, lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        cfgP = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="on",
                            tail_compaction=False)
        cfgX = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="off",
                            tail_compaction=False)
        tP = run_batch(step_cloud, sfc, src, rng.batch_key(0, 0), cfgP)
        tX = run_batch(step_cloud, sfc, src, rng.batch_key(1, 0), cfgX)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        for aP, aX in ((tP.flux_up, tX.flux_up),
                       (tP.flux_down, tX.flux_down)):
            a = np.asarray(aP) / nP
            b = np.asarray(aX) / nX
            sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
            assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 5.5


class TestPeriodicSeamMajorant:
    """Regression: with nx not divisible by macro_factor the last
    partial block's outer face is VIRTUAL (past the periodic wrap); an
    unclamped block-face clip let photons cross the seam into a
    high-majorant block while sampling against the clear block's
    ceiling -- traversing cloud WITHOUT collision tests (systematic
    under-attenuation; pre-fix they effectively teleported
    (block_face - nx) columns into the cloud). Ground truth is the same
    kernel with macro_factor=0 (single global majorant, always valid).
    The flagship 325x325 at macro_factor=8 hits exactly this (41 blocks,
    last one 5 wide)."""

    def _scene(self, macro_factor):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        nx, ny, nz = 20, 8, 8
        ext = np.zeros((nx, ny, nz))
        ext[0:8, :, :] = 0.08  # thick cloud in block 0 (tau/col = 4)
        grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 32)], key=[1.0])
        comp = OpticalComponent("seam cloud", ext,
                                np.full_like(ext, 0.5),
                                np.zeros(ext.shape, np.int32), table)
        return build_domain(grid, [comp], macro_factor=macro_factor,
                            n_cdf_steps=101)

    def test_seam_matches_global_majorant(self):
        # beam tilted so photons over the clear strip drift +x across
        # the wrap into the cloud
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.0)
        res = {}
        for mf in (0, 8):
            dom = self._scene(mf)
            cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                               max_steps=8000, use_pallas="on",
                               tail_compaction=False)
            t = run_batch(dom, sfc, src, rng.batch_key(11, mf), cfg)
            res[mf] = (float(np.asarray(t.flux_down).sum())
                       / int(t.n_photons))
        n = 2048 * 8
        sigma = np.sqrt(res[0] * (1 - res[0]) / n)
        assert res[8] == pytest.approx(res[0], abs=5 * sigma), (
            f"macro seam transmission bias: mf8 {res[8]} vs mf0 {res[0]}")

    def test_seam_xla_matches_global_majorant(self):
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.0)
        res = {}
        for mf in (0, 8):
            dom = self._scene(mf)
            cfg = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                               max_steps=8000, use_pallas="off")
            t = run_batch(dom, sfc, src, rng.batch_key(11, mf), cfg)
            res[mf] = (float(np.asarray(t.flux_down).sum())
                       / int(t.n_photons))
        n = 2048 * 8
        sigma = np.sqrt(res[0] * (1 - res[0]) / n)
        assert res[8] == pytest.approx(res[0], abs=5 * sigma), (
            f"XLA macro seam bias: mf8 {res[8]} vs mf0 {res[0]}")


class TestFluxAbs2D:
    """need_volume_absorption=False fast path: the record kernel tallies
    absorbed flux per COLUMN and skips the [nxyz] volume rows (the
    tally's dominant cost; see PallasConfig.flux_abs_2d). Same events,
    same physics -- only the accumulator layout changes."""

    def test_matches_volume_tally_run(self, step_cloud):
        src = illumination.directional(0.5, 0.0)
        sfc = Surface.lambertian(0.2)
        base = dict(n_lanes=2048, photons_per_lane=16, max_steps=6000,
                    use_pallas="on", tail_compaction=False)
        cfg2d = KernelConfig(need_volume_absorption=False, **base)
        cfg3d = KernelConfig(need_volume_absorption=True, **base)
        t2 = run_batch(step_cloud, sfc, src, rng.batch_key(7, 0), cfg2d)
        t3 = run_batch(step_cloud, sfc, src, rng.batch_key(7, 0), cfg3d)
        assert t2.volume_absorption is None
        assert t3.volume_absorption is not None
        # same seed, same streams: only the absorbed ROUTING differs, so
        # fluxes are bit-identical and absorbed matches to the bf16
        # value-split reconstruction error
        np.testing.assert_array_equal(np.asarray(t2.flux_up),
                                      np.asarray(t3.flux_up))
        np.testing.assert_array_equal(np.asarray(t2.flux_down),
                                      np.asarray(t3.flux_down))
        np.testing.assert_allclose(np.asarray(t2.flux_absorbed),
                                   np.asarray(t3.flux_absorbed),
                                   rtol=1e-4, atol=1e-3)
        n = int(t2.n_photons)
        bal = (float(t2.flux_up.sum()) + 0.8 * float(t2.flux_down.sum())
               + float(t2.flux_absorbed.sum())) / n
        assert bal == pytest.approx(1.0, abs=2e-3)


class TestDynGather:
    """Dynamic-gather record fetch (PallasConfig.dyn_gather): per-lane
    take_along_axis rows replace the one-hot MXU gather for small
    tables. Exact f32 records, same physics; A/B against the forced
    one-hot path must agree statistically (the record quantization
    differs -- bf16 split vs exact -- so trajectories may diverge)."""

    def test_resolver_engages_on_step_cloud(self, step_cloud):
        from mcbrat3d_tpu.transport.pallas_kernel import (
            _DYN_GATHER_MAX_OPS, _dyn_gather_fields)
        h_cells = -(-int(np.prod(step_cloud.grid.shape)) // 128)
        nf = _dyn_gather_fields(1, bool(step_cloud.uniform_ssa),
                                bool(step_cloud.uniform_hg),
                                int(step_cloud.macro_factor))
        assert h_cells == 8 and nf * h_cells <= _DYN_GATHER_MAX_OPS

    def test_matches_onehot_gather(self, step_cloud):
        base = dict(rows=16, block_rows=8, steps_per_call=32,
                    max_steps=6000, interpret=True)
        key = rng.batch_key(11, 0)
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        dyn = run_batch_pallas(step_cloud, sfc, src, key,
                               PallasConfig(**base), 16)
        oh = run_batch_pallas(step_cloud, sfc, src, key,
                              PallasConfig(debug_parts="all,nodyn",
                                           **base), 16)
        n = float(dyn[3])
        assert int(dyn[3]) == int(oh[3])
        for i, name in ((0, "flux_up"), (1, "flux_down")):
            a = float(np.asarray(dyn[i]).sum())
            b = float(np.asarray(oh[i]).sum())
            assert abs(a - b) <= max(4.0, 0.005 * n), f"{name}: {a} vs {b}"
        # conservation on the dyn path itself
        bal = (float(np.asarray(dyn[0]).sum())
               + 0.8 * float(np.asarray(dyn[1]).sum())
               + float(np.asarray(dyn[2]).sum())) / n
        assert bal == pytest.approx(1.0, abs=5e-3)

    def test_flux_abs_2d_dyn(self, step_cloud):
        """The headline config: dyn gather + per-column absorbed tally
        (no sublane one-hot built anywhere in the gather)."""
        src = illumination.directional(0.5, 0.0)
        cfg = KernelConfig(n_lanes=2048, photons_per_lane=16,
                           max_steps=6000, use_pallas="on",
                           need_volume_absorption=False,
                           tail_compaction=False)
        t = run_batch(step_cloud, Surface.lambertian(0.0), src,
                      rng.batch_key(3, 0), cfg)
        assert t.volume_absorption is None
        n = int(t.n_photons)
        bal = (float(t.flux_up.sum()) + float(t.flux_down.sum())
               + float(t.flux_absorbed.sum())) / n
        assert bal == pytest.approx(1.0, abs=2e-3)


class TestHiFirstGather:
    """Hi-first big-table gathers (_hif_gather2): the inverse-CDF,
    forward-phase, and emission-alias tables are packed transposed
    ([256, hp] f32) and gathered by a sublane hi one-hot + one MXU dot +
    a lo masked reduce, replacing the lo-first form whose
    [blk, n_fields*hp, 128] intermediate dominated at big tables.
    Exact f32 (no bf16 split), so trajectories may diverge from the
    nohif path within the bf16 quantization band -- compare
    statistically, never bitwise."""

    def test_tabulated_flux_hif_vs_nohif(self):
        dom = TestTabulatedPhaseFunctions()._domain(two_entries=True)
        base = dict(rows=16, block_rows=8, steps_per_call=32,
                    max_steps=8000, interpret=True)
        key = rng.batch_key(21, 0)
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        hif = run_batch_pallas(dom, sfc, src, key,
                               PallasConfig(**base), 8)
        noh = run_batch_pallas(dom, sfc, src, key,
                               PallasConfig(debug_parts="all,nohif",
                                            **base), 8)
        n = int(hif[3])
        assert n == int(noh[3])
        for i, name in ((0, "flux_up"), (1, "flux_down")):
            a = float(np.asarray(hif[i]).sum())
            b = float(np.asarray(noh[i]).sum())
            assert abs(a - b) <= max(4.0, 0.01 * n), f"{name}: {a} vs {b}"
        # conservation on the hif path itself (albedo 0.2 surface)
        bal = (float(np.asarray(hif[0]).sum())
               + 0.8 * float(np.asarray(hif[1]).sum())
               + float(np.asarray(hif[2]).sum())) / n
        assert bal == pytest.approx(1.0, abs=5e-3)

    def test_lw_emission_hif_vs_nohif(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction, PhaseFunctionTable)
        from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                                   emission_weighting)
        nx, ny, nz = 8, 4, 8
        rs = np.random.RandomState(3)
        grid = Grid.regular(nx, ny, nz, 0.5, 0.5, 0.25)
        tbl = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 64)], key=[1.0])
        cld = rs.rand(nx, ny, nz) * 6.0
        comp = OpticalComponent("cloud", cld, np.full_like(cld, 0.6),
                                np.zeros(cld.shape, np.int32), tbl)
        temps = 250.0 + 40.0 * rs.rand(nx, ny, nz)
        dom = build_domain(grid, [comp], temps=temps, n_cdf_steps=201)
        kabs = absorption_coefficient([comp], grid)
        w = emission_weighting(grid, temps, kabs, 290.0, 0.95, 10.0)
        src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                    grid.shape)
        base = dict(rows=16, block_rows=8, steps_per_call=32,
                    max_steps=8000, interpret=True)
        key = rng.batch_key(22, 0)
        sfc = Surface.lambertian(0.05)
        hif = run_batch_pallas(dom, sfc, src, key, PallasConfig(**base),
                               8, lw_mode=True)
        noh = run_batch_pallas(dom, sfc, src, key,
                               PallasConfig(debug_parts="all,nohif",
                                            **base), 8, lw_mode=True)
        n = int(hif[3])
        assert n == int(noh[3])
        # the emission-voxel histogram rides the volume tally (lw
        # pre-credits): domain-total emitted-minus-absorbed must agree
        a = float(np.asarray(hif[2]).sum())
        b = float(np.asarray(noh[2]).sum())
        assert abs(a - b) <= max(4.0, 0.02 * abs(b) + 0.01 * n)


    def test_tabulated_inverse_fetch_variants_agree(self):
        """The round-5 WIDE hi-first inverse fetch (_hif_gather2w, the
        default) vs the per-row f32 form ("rowhif") -- same exact-f32
        values, so tallies are IDENTICAL -- and vs the bf16-split form
        ("bf16hif"), whose angle splits reconstruct to ~2^-24 relative
        (statistical agreement only; kept for A/B, measured slower on
        hardware)."""
        dom = TestTabulatedPhaseFunctions()._domain(two_entries=True)
        base = dict(rows=16, block_rows=8, steps_per_call=32,
                    max_steps=8000, interpret=True)
        key = rng.batch_key(23, 0)
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        wide = run_batch_pallas(dom, sfc, src, key,
                                PallasConfig(**base), 8)
        row = run_batch_pallas(dom, sfc, src, key,
                               PallasConfig(debug_parts="all,rowhif",
                                            **base), 8)
        b16 = run_batch_pallas(dom, sfc, src, key,
                               PallasConfig(debug_parts="all,bf16hif",
                                            **base), 8)
        n = int(wide[3])
        assert n == int(row[3]) == int(b16[3])
        for i, name in ((0, "flux_up"), (1, "flux_down")):
            a = float(np.asarray(wide[i]).sum())
            b = float(np.asarray(row[i]).sum())
            c = float(np.asarray(b16[i]).sum())
            # wide vs per-row: identical f32 values, identical streams
            assert a == pytest.approx(b, rel=1e-6), f"{name}: {a} vs {b}"
            # bf16 split: statistical band
            assert abs(a - c) <= max(4.0, 0.01 * n), f"{name}: {a} vs {c}"
        bal = (float(np.asarray(wide[0]).sum())
               + 0.8 * float(np.asarray(wide[1]).sum())
               + float(np.asarray(wide[2]).sum())) / n
        assert bal == pytest.approx(1.0, abs=5e-3)


class TestPerPixelSurface:
    """Per-pixel Lambertian albedo in the record megakernel: the packed
    per-column albedo (surface grid divides the domain columns) is
    fetched at the landing column with per-lane dynamic gathers.
    Reference per-pixel surface grid: src/surfaceProperties.f95:32-36,
    119-147."""

    def _checker(self, nxs, lo=0.05, hi=0.65):
        alb = np.where(np.arange(nxs) % 2 == 0, lo, hi).astype(np.float32)
        return Surface(params=jnp.asarray(alb.reshape(nxs, 1, 1)),
                       brdf_name="Lambertian")

    def test_eligibility_envelope(self, step_cloud):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        src = illumination.directional(0.5, 0.0)
        sfc = self._checker(8)
        assert sfc.is_lambertian_grid and not sfc.is_uniform_lambertian
        assert pk.pallas_eligible(
            step_cloud, sfc, src, lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        # non-divisible surface grid (32 % 5 != 0) falls off
        assert not pk.pallas_eligible(
            step_cloud, self._checker(5), src, lw_mode=False,
            compute_intensity=False, record_scattering_orders=0,
            use_ray_tracing=False)
        # lw_mode excluded (surface BBEmission uses the uniform albedo)
        assert not pk.surface_px_ok(sfc, step_cloud.grid, lw_mode=True)

    def test_uniform_valued_grid_matches_scalar_bitwise(self, step_cloud):
        """A [4,1] grid holding one value everywhere must reproduce the
        uniform-Lambertian megakernel run bit-for-bit (same streams, and
        the gathered f32 albedo equals the scalar): proves the packing,
        the column keying, and the gather plumbing with zero tolerance."""
        src = illumination.directional(0.5, 0.0)
        cfg = KernelConfig(n_lanes=2048, photons_per_lane=8,
                           max_steps=6000, use_pallas="on",
                           tail_compaction=False)
        key = rng.batch_key(3, 0)
        grid_sfc = Surface(
            params=jnp.full((4, 1, 1), 0.3, jnp.float32),
            brdf_name="Lambertian")
        tG = run_batch(step_cloud, grid_sfc, src, key, cfg)
        tU = run_batch(step_cloud, Surface.lambertian(0.3), src, key, cfg)
        assert int(tG.n_photons) == int(tU.n_photons)
        np.testing.assert_array_equal(np.asarray(tG.flux_up),
                                      np.asarray(tU.flux_up))
        np.testing.assert_array_equal(np.asarray(tG.flux_down),
                                      np.asarray(tU.flux_down))

    def test_checkerboard_matches_xla(self, step_cloud):
        sfc = self._checker(8)
        src = illumination.directional(0.5, 0.0)
        cfgP = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="on",
                            tail_compaction=False)
        cfgX = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="off",
                            tail_compaction=False)
        tP = run_batch(step_cloud, sfc, src, rng.batch_key(0, 0), cfgP)
        tX = run_batch(step_cloud, sfc, src, rng.batch_key(1, 0), cfgX)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        for aP, aX in ((tP.flux_up, tX.flux_up),
                       (tP.flux_down, tX.flux_down)):
            a = np.asarray(aP) / nP
            b = np.asarray(aX) / nX
            sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
            assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 5.5
        # the checkerboard really discriminates: bright-stripe columns
        # reflect more than dark-stripe columns (x-resolved flux_up)
        up = np.asarray(tP.flux_up)[:, 0]
        stripe = np.repeat(np.arange(8) % 2 == 0, 4)
        assert up[~stripe].mean() > up[stripe].mean()

    def test_intensity_stays_eligible(self, step_cloud):
        """The in-kernel surface LE term (Lambertian 1/pi) is albedo-
        independent; the per-pixel albedo rides w_refl, so radiance
        keeps megakernel eligibility and matches XLA."""
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        sfc = self._checker(8, lo=0.1, hi=0.8)
        src = illumination.directional(0.5, 0.0)
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 180.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False, pallas_min_mu=0.3)
        assert not pk.intensity_ineligibility_reasons(
            dom, sfc, src, False, 0, False, icfg, dirs, True)
        cfgP = KernelConfig(n_lanes=2048, photons_per_lane=8,
                            max_steps=6000, use_pallas="on",
                            tail_compaction=False)
        cfgX = KernelConfig(n_lanes=2048, photons_per_lane=8,
                            max_steps=6000, use_pallas="off",
                            tail_compaction=False)
        tP = run_batch(dom, sfc, src, rng.batch_key(0, 0), cfgP,
                       intensity_config=icfg, intensity_dirs=dirs)
        tX = run_batch(dom, sfc, src, rng.batch_key(1, 0), cfgX,
                       intensity_config=icfg, intensity_dirs=dirs)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        a = np.asarray(tP.intensity) / nP
        b = np.asarray(tX.intensity) / nX
        sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
        assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 6.0


class TestRPVSurface:
    """Uniform RPV BRDF in-kernel: the record megakernel evaluates the
    Rahman-Pinty-Verstraete weight at surface bounces (trig-free form),
    matching the XLA path's physics/surface.py:rpv_reflectance.
    Reference extension point: src/surfaceProperties.f95:119-147."""

    def test_rpv_eligible_and_matches_xla(self, step_cloud):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        sfc = Surface.rpv(0.25, k=0.8, theta=-0.15)
        src = illumination.directional(0.5, 0.3)
        assert sfc.is_uniform_rpv
        assert pk.pallas_eligible(
            step_cloud, sfc, src, lw_mode=False, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False)
        cfgP = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="on",
                            tail_compaction=False)
        cfgX = KernelConfig(n_lanes=2048, photons_per_lane=16,
                            max_steps=6000, use_pallas="off",
                            tail_compaction=False)
        tP = run_batch(step_cloud, sfc, src, rng.batch_key(0, 0), cfgP)
        tX = run_batch(step_cloud, sfc, src, rng.batch_key(1, 0), cfgX)
        nP, nX = float(tP.n_photons), float(tX.n_photons)
        # flux_up is the discriminating output (surface-reflected power)
        for aP, aX in ((tP.flux_up, tX.flux_up),
                       (tP.flux_down, tX.flux_down)):
            a = np.asarray(aP) / nP
            b = np.asarray(aX) / nX
            sig = np.sqrt(np.abs(a) / nP + np.abs(b) / nX + 1e-12)
            assert (np.abs(a - b) / np.maximum(sig, 1e-9)).max() < 5.5
        # and RPV really differs from a Lambertian of the same rho0
        # (otherwise this A/B would not exercise the new branch)
        tL = run_batch(step_cloud, Surface.lambertian(0.25), src,
                       rng.batch_key(0, 0), cfgP)
        rup_rpv = float(np.asarray(tP.flux_up).sum()) / nP
        rup_lam = float(np.asarray(tL.flux_up).sum()) / float(tL.n_photons)
        assert abs(rup_rpv - rup_lam) > 0.01

    def test_rpv_intensity_stays_xla(self, step_cloud):
        """The in-kernel local-estimate surface term is Lambertian 1/pi;
        radiance with an RPV surface must NOT claim megakernel
        eligibility."""
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.transport.local_estimate import IntensityConfig
        import jax.numpy as jnp
        dirs = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
        icfg = IntensityConfig(n_dirs=1, use_russian_roulette=False,
                               use_hybrid_phase=False)
        reasons = pk.intensity_ineligibility_reasons(
            step_cloud, Surface.rpv(0.25), illumination.directional(0.5, 0.0),
            False, 0, False, icfg, dirs, True)
        assert any("non-Lambertian" in r for r in reasons)


class TestIntensityRRHybrid:
    """The production-default radiance configuration (Iwabuchi Russian
    roulette + hybrid phase functions) runs in-kernel. The in-kernel march
    is a fixed-bound fori, so the RR branches are applied POST-march from
    the full optical depth -- statistically identical to the reference's
    early-stopped marches (reference:
    Integrators/monteCarloRadiativeTransfer.f95:1753-1813); hybrid phase
    values come from a forward table resampled uniform in sin(theta/2)
    (sqrt-only index, no arccos in Mosaic)."""

    def _compare(self, dom, icfg, dirs, rel):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        ok = pk.pallas_intensity_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), lw_mode=False,
            record_scattering_orders=0, use_ray_tracing=False,
            icfg=icfg, dirs=dirs,
            dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        assert ok, "expected megakernel eligibility"
        cfgX = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                            max_steps=20_000, use_pallas="off")
        cfgP = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                            max_steps=20_000, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(4, 0), cfgX,
                      intensity_config=icfg, intensity_dirs=dirs)
        t2 = run_batch(dom, Surface.lambertian(0.2),
                       illumination.directional(0.5, 0.0),
                       rng.batch_key(4, 1), cfgP,
                       intensity_config=icfg, intensity_dirs=dirs)
        iref = np.asarray(t.intensity) / int(t.n_photons)
        imk = np.asarray(t2.intensity) / int(t2.n_photons)
        for d in range(icfg.n_dirs):
            a, b = iref[:, :, d].mean(), imk[:, :, d].mean()
            assert b == pytest.approx(a, rel=rel), f"dir {d}: {a} vs {b}"

    def test_sublane_tally_matches_old_orientation(self):
        """The sublane-oriented LE tally (photon index in the lane dim,
        matching the flux fast tally's ~11-vs-38 us layout) must agree
        per-pixel with the round-4 K-merged form (debug_parts
        'oldletally') on the SAME key -- identical streams and identical
        contributions, only the scatter-add association differs."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True,
                              hybrid_width_deg=10.0)
        dirs = make_intensity_directions([1.0, 0.5], [0.0, 135.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=True,
                               use_hybrid_phase=True)
        out = {}
        for parts in ("all", "all,oldletally"):
            cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                               max_steps=20_000, use_pallas="on",
                               pallas_debug_parts=parts)
            t = run_batch(dom, Surface.lambertian(0.2),
                          illumination.directional(0.5, 0.0),
                          rng.batch_key(4, 2), cfg,
                          intensity_config=icfg, intensity_dirs=dirs)
            out[parts] = np.asarray(t.intensity) / int(t.n_photons)
        np.testing.assert_allclose(out["all"], out["all,oldletally"],
                                   rtol=5e-4, atol=1e-7)

    def test_rr_hybrid_matches_xla(self):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True,
                              hybrid_width_deg=10.0)
        dirs = make_intensity_directions([1.0, 0.5], [0.0, 0.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=True,
                               use_hybrid_phase=True)
        self._compare(dom, icfg, dirs, rel=0.08)

    def test_limit_contributions_matches_xla(self):
        """limitIntensityContributions in-kernel: contributions capped,
        clipped excess banked per (direction, component slot) and
        redistributed across the image post-launch -- vs the XLA twin
        (reference:
        Integrators/monteCarloRadiativeTransfer.f95:294-322,1815-1826)."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201)
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 0.0])
        # a LOW cap so a real fraction of contributions clip (forward-HG
        # phase values reach ~w*80/(4 pi mu) at aligned geometries)
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False,
                               limit_contributions=True,
                               max_contribution=0.2)
        self._compare(dom, icfg, dirs, rel=0.08)
        # capping must actually engage: the capped image must differ
        # per-pixel from the uncapped one while conserving the total
        # (redistribution puts the excess back)
        icfg_off = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                                   use_hybrid_phase=False)
        cfgP = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                            max_steps=20_000, use_pallas="on")
        args = (dom, Surface.lambertian(0.2),
                illumination.directional(0.5, 0.0), rng.batch_key(4, 1),
                cfgP)
        t_cap = run_batch(*args, intensity_config=icfg,
                          intensity_dirs=dirs)
        t_unc = run_batch(*args, intensity_config=icfg_off,
                          intensity_dirs=dirs)
        a = np.asarray(t_cap.intensity)
        b = np.asarray(t_unc.intensity)
        assert float(a.sum()) == pytest.approx(float(b.sum()), rel=1e-4)
        assert np.abs(a - b).max() > 1e-6 * np.abs(b).max()

    def test_tabulated_phase_intensity_matches_xla(self):
        """Non-HG domain: in-kernel phase values from the (original)
        forward table, row resolved through the per-cell phase field."""
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        nx, ny, nz = 16, 1, 16
        grid = Grid.regular(nx, ny, nz, 500.0 / 16, 500.0, 250.0 / 16)
        ext = np.full((nx, ny, nz), 8.0 / 250.0)
        l = np.arange(1, 65, dtype=np.float64)
        pf = PhaseFunction(coefficients=0.7 * 0.8**l + 0.3 * 0.2**l)
        tbl = PhaseFunctionTable([pf], key=[1.0])
        comp = OpticalComponent("mix", ext, np.full_like(ext, 0.99),
                                np.zeros(ext.shape, np.int32), tbl)
        dom = build_domain(grid, [comp], n_cdf_steps=201,
                           compute_intensity_tables=True)
        assert not dom.all_hg
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 90.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False)
        self._compare(dom, icfg, dirs, rel=0.08)


class TestManyDirectionsAllQuadrants:
    """Regression for the negative-direction march stall (round-3 find):
    in-kernel local estimation must match the XLA path in EVERY azimuth
    quadrant (the f32 position nudge used to round away on faces, stalling
    marches for directions with negative x/y components and silently
    dropping ~half their contributions), and n_dirs > 6 exercises the
    fori-over-directions path."""

    def test_eight_directions_match_xla(self):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        mus = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4]
        phis = [0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0]
        dirs = make_intensity_directions(mus, phis)
        icfg = IntensityConfig(n_dirs=8, use_russian_roulette=False,
                               use_hybrid_phase=False, pallas_min_mu=0.4)
        cfgX = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                            max_steps=20000, use_pallas="off")
        cfgP = KernelConfig(n_lanes=1 << 11, photons_per_lane=8,
                            max_steps=20000, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(4, 0), cfgX,
                      intensity_config=icfg, intensity_dirs=dirs)
        t2 = run_batch(dom, Surface.lambertian(0.2),
                       illumination.directional(0.5, 0.0),
                       rng.batch_key(4, 1), cfgP,
                       intensity_config=icfg, intensity_dirs=dirs)
        iref = np.asarray(t.intensity) / int(t.n_photons)
        imk = np.asarray(t2.intensity) / int(t2.n_photons)
        assert int(t2.n_bad) == 0  # no truncated marches
        for d in range(8):
            a, b = iref[:, :, d].mean(), imk[:, :, d].mean()
            assert b == pytest.approx(a, rel=0.10), (
                f"dir {d} (phi {phis[d]}): xla {a} vs pallas {b}")

    def test_forty_eight_directions_eligible_and_match(self):
        """n_dirs > 32 (round-4: cap raised to 64 with 256 RNG draw
        sites): the grouped-march fori path must stay correct at
        production-scale direction counts (reference radiance grids go to
        648 directions, Drivers/monteCarloDriver.f95:61)."""
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        mus = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5] * 8
        phis = [(i * 67.5) % 360.0 for i in range(48)]
        dirs = make_intensity_directions(mus, phis)
        icfg = IntensityConfig(n_dirs=48, use_russian_roulette=True,
                               use_hybrid_phase=False, pallas_min_mu=0.4)
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        assert pk.pallas_intensity_eligible(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0), lw_mode=False,
            record_scattering_orders=0, use_ray_tracing=False,
            icfg=icfg, dirs=dirs,
            dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        cfgX = KernelConfig(n_lanes=1 << 10, photons_per_lane=8,
                            max_steps=20000, use_pallas="off")
        cfgP = KernelConfig(n_lanes=1 << 10, photons_per_lane=8,
                            max_steps=20000, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(4, 0), cfgX,
                      intensity_config=icfg, intensity_dirs=dirs)
        t2 = run_batch(dom, Surface.lambertian(0.2),
                       illumination.directional(0.5, 0.0),
                       rng.batch_key(4, 1), cfgP,
                       intensity_config=icfg, intensity_dirs=dirs)
        assert int(t2.n_bad) == 0
        iref = np.asarray(t.intensity) / int(t.n_photons)
        imk = np.asarray(t2.intensity) / int(t2.n_photons)
        # per-direction means at modest photon counts: 4-sigma-ish band
        for d in range(48):
            a, b = iref[:, :, d].mean(), imk[:, :, d].mean()
            assert b == pytest.approx(a, rel=0.25), (
                f"dir {d} (mu {mus[d]}, phi {phis[d]}): {a} vs {b}")
        # and the direction-summed image tightly
        assert imk.sum() == pytest.approx(iref.sum(), rel=0.05)

    def test_missing_forward_tables_raise(self):
        """Non-HG (tabulated-phase) domains still require forward tables
        for intensity; all-HG domains are exempt (analytic phase values)."""
        from mcbrat3d_tpu.physics.phase_function import PhaseFunction
        from mcbrat3d_tpu.scenes.plane_parallel import make_slab
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        mix = PhaseFunction(
            coefficients=0.7 * 0.8 ** np.arange(1, 33)
            + 0.3 * 0.3 ** np.arange(1, 33), description="mix")
        dom = make_slab(tau=1.0, ssa=0.9, nx=2, ny=2, nz=4, n_cdf_steps=201,
                        phase=mix)  # tabulated phase, no intensity tables
        assert not dom.all_hg
        dirs = make_intensity_directions([1.0], [0.0])
        icfg = IntensityConfig(n_dirs=1)
        cfg = KernelConfig(n_lanes=256, photons_per_lane=1, max_steps=100)
        with pytest.raises(ValueError, match="forward phase"):
            run_batch(dom, Surface.lambertian(0.0),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        # the all-HG equivalent runs (analytic HG estimator, no tables)
        dom_hg = make_step_cloud(ssa=0.99, n_cdf_steps=201)
        assert dom_hg.all_hg
        t = run_batch(dom_hg, Surface.lambertian(0.0),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        assert float(np.asarray(t.intensity).sum()) >= 0


class TestLWIntensityInKernel:
    """LW radiance in-kernel: freshly emitted lanes contribute their
    emission local estimate on a held first step (one LE march per lane
    per step), then transport normally. Anchored to the exact isothermal
    blackbody result: an optically thick isothermal atmosphere over a
    black surface at the same temperature radiates B_lambda(T) into every
    upward direction (reference physics:
    Integrators/monteCarloRadiativeTransfer.f95:504-542, 1688-1696)."""

    def test_isothermal_blackbody_radiance(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.core.planck import planck_radiance
        from mcbrat3d_tpu.domain.domain import (OpticalComponent,
                                                build_domain)
        from mcbrat3d_tpu.physics.phase_function import (PhaseFunction,
                                                         PhaseFunctionTable)
        from mcbrat3d_tpu.spectral.weights import (absorption_coefficient,
                                                   emission_weighting)
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        T, lam = 288.0, 10.0
        nx, ny, nz = 4, 4, 8
        grid = Grid.regular(nx, ny, nz, 0.25, 0.25, 0.25)
        temps = np.full((nx, ny, nz), T)
        ext = np.full((nx, ny, nz), 6.0)  # tau 12: effectively black
        tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
        comp = OpticalComponent("abs", ext, np.zeros_like(ext),
                                np.zeros(ext.shape, np.int32), tbl)
        domain = build_domain(grid, [comp], temps=temps, n_cdf_steps=101,
                              compute_intensity_tables=True)
        kabs = absorption_coefficient([comp], grid)
        w = emission_weighting(grid, temps, kabs, T, 1.0, lam)
        source = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                       grid.shape)
        dirs = make_intensity_directions([1.0, 0.6], [0.0, 90.0])
        icfg = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                               use_hybrid_phase=False, pallas_min_mu=0.5)
        assert pk.pallas_intensity_eligible(
            domain, Surface.lambertian(0.0), source, lw_mode=True,
            record_scattering_orders=0, use_ray_tracing=False,
            icfg=icfg, dirs=dirs,
            dirs_mu_ok=pk.dirs_mu_floor_ok(icfg, dirs))
        cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=8,
                           max_steps=4000, use_pallas="on",
                           tail_compaction=False, lw_mode=True)
        t = run_batch(domain, Surface.lambertian(0.0), source,
                      rng.batch_key(0, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        tn = t.normalized(domain.grid)
        B = planck_radiance(lam, T)
        assert int(t.n_bad) == 0
        for d in range(2):
            L = float(np.asarray(tn.intensity)[:, :, d].mean()) * w.flux
            assert L == pytest.approx(B, rel=0.05), (d, L, B)


class TestColumnCTMarch:
    """The "colct" march (per-column cumulative-tau tables, one gather per
    COLUMN crossing) must agree with the "cell" march (per-cell-face DDA)
    to floating-point rounding: with the SAME key both modes trace the
    same photon histories (the march consumes no extra RNG), and the
    per-event tau integrals are mathematically identical -- integral of
    beta over a slant segment within a column equals
    (CT(z_in) - CT(z_out)) / mu for the piecewise-linear cumulative
    vertical optical depth CT (reference march being reformulated:
    Integrators/monteCarloRadiativeTransfer.f95:1623-1752). "auto" picks
    a formulation per direction and must agree with both."""

    def _run(self, march, key_b=0, rr=False):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        # steep + shallow + all azimuth quadrants (the round-3
        # negative-direction stall was invisible at phi = 0)
        mus = [1.0, 0.6, 0.45, 0.45]
        phis = [0.0, 135.0, 225.0, 315.0]
        dirs = make_intensity_directions(mus, phis)
        icfg = IntensityConfig(n_dirs=4, use_russian_roulette=rr,
                               use_hybrid_phase=False, pallas_min_mu=0.4,
                               pallas_march=march)
        cfg = KernelConfig(n_lanes=1 << 9, photons_per_lane=4,
                           max_steps=6000, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(9, key_b), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        assert int(t.n_bad) == 0
        return np.asarray(t.intensity) / int(t.n_photons)

    def test_same_key_pixelwise_agreement(self):
        i_cell = self._run("cell")
        i_ct = self._run("colct")
        i_auto = self._run("auto")
        assert i_ct.shape == i_cell.shape
        # same histories, same estimator: per-pixel agreement to fp
        # rounding of the tau accumulation order
        scale = float(np.max(i_cell))
        np.testing.assert_allclose(i_ct, i_cell, rtol=5e-3,
                                   atol=2e-4 * scale)
        # auto must reproduce whichever formulation it picked per
        # direction -- i.e. land within the same rounding envelope
        np.testing.assert_allclose(i_auto, i_cell, rtol=5e-3,
                                   atol=2e-4 * scale)

    def test_colscan_same_key_pixelwise_agreement(self):
        # closed-form column scan (ny == 1 eligibility): the mu = 0.45
        # directions unwrap past nx columns (W = 2 periodic wraps), so
        # the wrap arithmetic (sigma-residue -> first unwrapped cell per
        # wrap) is exercised alongside the steep no-wrap case
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        g = make_step_cloud().grid
        s = float(np.sqrt(1.0 - 0.45 ** 2))
        assert pk.march_bound_for_dir(g, s, 0.0, 0.45, "colscan") > 32
        i_cell = self._run("cell")
        i_cs = self._run("colscan")
        scale = float(np.max(i_cell))
        np.testing.assert_allclose(i_cs, i_cell, rtol=5e-3,
                                   atol=2e-4 * scale)

    def test_rr_same_key_agreement(self):
        # with Iwabuchi RR the tau rounding can flip rare branch
        # decisions (the tau comparisons against tau_free/tau_max), so
        # same-key runs differ on a handful of pixels; the mean must
        # stay tight
        a = self._run("cell", key_b=1, rr=True)
        b = self._run("colct", key_b=1, rr=True)
        assert np.mean(b) == pytest.approx(np.mean(a), rel=0.02)


class TestGroupedDirections:
    """> 6 directions run through per-group fori loops over a SORTED
    direction order (plan_march packs <= 4 (formulation, bound) groups
    and the launcher un-permutes the output). With the same key an 8-dir
    grouped run must reproduce two 4-dir unrolled runs pixelwise: local
    estimation is passive (consumes no step RNG), so the photon
    histories are identical (reference direction loop:
    Drivers/monteCarloDriver.f95:61, Integrators/
    monteCarloRadiativeTransfer.f95:1623-1640)."""

    def _run(self, mus, phis):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        dirs = make_intensity_directions(mus, phis)
        icfg = IntensityConfig(n_dirs=len(mus), use_russian_roulette=False,
                               use_hybrid_phase=False, pallas_min_mu=0.4,
                               pallas_march="auto")
        cfg = KernelConfig(n_lanes=1 << 9, photons_per_lane=4,
                           max_steps=6000, use_pallas="on")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(9, 0), cfg,
                      intensity_config=icfg, intensity_dirs=dirs)
        assert int(t.n_bad) == 0
        return np.asarray(t.intensity) / int(t.n_photons)

    def test_grouped_matches_unrolled_split(self):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        mus = [1.0, 0.45, 0.8, 0.5, 0.9, 0.6, 0.45, 1.0]
        phis = [0, 135, 45, 225, 90, 315, 180, 270]
        # the plan must actually sort + group (guards against the
        # grouped path silently running ungrouped)
        dom = make_step_cloud(ssa=0.99, compute_intensity_tables=True)
        icfg = IntensityConfig(n_dirs=8, pallas_march="auto")
        plan = pk.plan_march(
            dom.grid, icfg, make_intensity_directions(mus, phis))
        assert plan[3] and plan[4] != tuple(range(8))
        a = self._run(mus[:4], phis[:4])
        b = self._run(mus[4:], phis[4:])
        c = self._run(mus, phis)
        sc = max(float(a.max()), float(b.max()))
        np.testing.assert_allclose(c[:, :, :4], a, rtol=5e-3,
                                   atol=2e-4 * sc)
        np.testing.assert_allclose(c[:, :, 4:], b, rtol=5e-3,
                                   atol=2e-4 * sc)


class TestDirChunkedRadiance:
    """Direction grids above MAX_KERNEL_DIRS split into chunked
    transport passes over the same photons (the reference's production
    radiance grids reach 648 directions,
    Drivers/monteCarloDriver.f95:61). Each chunk must be bit-identical
    to a direct run_batch at that chunk's directions, and the flux
    tallies must be chunk 0's (same key => same photon histories)."""

    def _setup(self):
        from mcbrat3d_tpu.transport.local_estimate import (
            IntensityConfig, make_intensity_directions)
        dom = make_step_cloud(ssa=0.99, macro_factor=8, n_cdf_steps=201,
                              compute_intensity_tables=True)
        mus = [1.0, 0.6, 0.45, 0.8, 0.45, 0.9, 0.5, 0.7]
        phis = [0.0, 135.0, 225.0, 315.0, 45.0, 90.0, 180.0, 270.0]
        dirs = make_intensity_directions(mus, phis)
        cfg = KernelConfig(n_lanes=1 << 9, photons_per_lane=2,
                           max_steps=6000, use_pallas="on")
        return dom, dirs, cfg, IntensityConfig

    def test_chunked_matches_manual_chunks(self, monkeypatch):
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        dom, dirs, cfg, IntensityConfig = self._setup()
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        key = rng.batch_key(9, 0)
        monkeypatch.setattr(pk, "MAX_KERNEL_DIRS", 3)
        icfg8 = IntensityConfig(n_dirs=8, use_russian_roulette=True,
                                use_hybrid_phase=False, pallas_min_mu=0.4)
        t = run_batch(dom, sfc, src, key, cfg, intensity_config=icfg8,
                      intensity_dirs=dirs)
        assert t.intensity.shape[-1] == 8
        # manual chunks (3, 3, 2) with the same key: bit-identical
        imgs = []
        fluxes = []
        for lo, hi in ((0, 3), (3, 6), (6, 8)):
            icfg_c = IntensityConfig(n_dirs=hi - lo,
                                     use_russian_roulette=True,
                                     use_hybrid_phase=False,
                                     pallas_min_mu=0.4)
            tc = run_batch(dom, sfc, src, key, cfg,
                           intensity_config=icfg_c,
                           intensity_dirs=dirs[:, lo:hi])
            imgs.append(np.asarray(tc.intensity))
            fluxes.append(np.asarray(tc.flux_up))
        np.testing.assert_array_equal(np.asarray(t.intensity),
                                      np.concatenate(imgs, axis=-1))
        # transport identical across chunks; fluxes are chunk 0's
        np.testing.assert_array_equal(fluxes[0], fluxes[1])
        np.testing.assert_array_equal(np.asarray(t.flux_up), fluxes[0])
        assert int(t.n_photons) == int(tc.n_photons)

    def test_ineligible_falls_through_to_xla(self, monkeypatch):
        # per-pixel albedo surface: in-kernel LE is ineligible, so the
        # chunker must decline and the XLA estimator runs once for all
        # directions (any count)
        from mcbrat3d_tpu.transport import pallas_kernel as pk
        dom, dirs, cfg, IntensityConfig = self._setup()
        nx, ny = dom.grid.shape[0], dom.grid.shape[1]
        import jax.numpy as jnp
        alb = (0.2 + 0.1 * np.arange(nx * ny).reshape(nx, ny)
               / (nx * ny)).astype(np.float32)
        sfc = Surface(params=jnp.asarray(alb)[:, :, None],
                      brdf_name="Lambertian")
        src = illumination.directional(0.5, 0.0)
        monkeypatch.setattr(pk, "MAX_KERNEL_DIRS", 3)
        icfg8 = IntensityConfig(n_dirs=8, use_russian_roulette=False,
                                use_hybrid_phase=False)
        cfg_auto = KernelConfig(n_lanes=1 << 7, photons_per_lane=1,
                                max_steps=1500)
        t = run_batch(dom, sfc, src, rng.batch_key(9, 0), cfg_auto,
                      intensity_config=icfg8, intensity_dirs=dirs)
        i = np.asarray(t.intensity)
        assert i.shape == (nx, ny, 8) and np.all(np.isfinite(i))
