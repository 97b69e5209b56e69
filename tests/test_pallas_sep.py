"""Separable-template megakernel tests (CPU interpreter mode).

The separable kernel (transport/pallas_sep.py) must match the XLA wave
kernel statistically on beta = a[col]*p[z] + q[z] domains -- same physics,
different RNG streams -- including the in-kernel separable BBEmission
sampling and LW pre-credit accounting. Domains here exceed the record
megakernel's 36864-cell envelope so run_batch dispatch exercises the
separable path.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.collection import lw_flagship_scene
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.spectral.weights import (
    absorption_coefficient,
    emission_weighting,
)
from mcbrat3d_tpu.transport import pallas_sep as ps
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch
from mcbrat3d_tpu.transport.pallas_kernel import PallasConfig


def make_sep_scene(nx=16, ny=16, nz=150, lambda_um=10.0, **kw):
    """Scaled-down flagship shape: rank-1 stratocumulus + uniform gas.
    16 x 16 x 150 = 38400 cells exceeds the record kernel envelope and
    exercises the second z slice (nz > 128)."""
    kw.setdefault("cloud_base_level", 55)
    kw.setdefault("cloud_top_level", 85)
    grid, comps, temps = lw_flagship_scene(nx=nx, ny=ny, nz=nz, **kw)
    dom = build_domain(grid, comps, temps=temps, macro_factor=8,
                       n_cdf_steps=201, lambda_um=lambda_um)
    return dom, comps, temps


@pytest.fixture(scope="module")
def scene():
    return make_sep_scene()


@pytest.fixture(scope="module")
def lw_source(scene):
    dom, comps, temps = scene
    kabs = absorption_coefficient(comps, dom.grid)
    w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.95, 10.0)
    return illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                 dom.grid.shape)


SMALL = PallasConfig(rows=8, block_rows=8, steps_per_call=16,
                     max_steps=4096, interpret=True)


class TestDetectionAndEligibility:
    def test_flagship_shape_detected(self, scene):
        dom, _, _ = scene
        assert dom.sep_template and not dom.col_template
        assert dom.sep_amp.shape == (16 * 16,)
        assert (dom.sep_zb, dom.sep_zt) == (55, 85)
        assert dom.sep_analytic_hg and dom.sep_tz_uniform
        # factorization reproduces the total extinction
        a = np.asarray(dom.sep_amp).reshape(16, 16)
        beta = (a[:, :, None] * np.asarray(dom.sep_pz)[None, None, :]
                + np.asarray(dom.sep_qz)[None, None, :])
        np.testing.assert_allclose(beta, np.asarray(dom.total_ext),
                                   rtol=1e-5, atol=1e-8)

    def test_eligibility(self, scene, lw_source):
        dom, _, _ = scene
        assert ps.pallas_sep_eligible(
            dom, Surface.lambertian(0.05), lw_source,
            lw_mode=True, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=False)
        reasons = ps.sep_ineligibility_reasons(
            dom, Surface.lambertian(0.05), lw_source,
            lw_mode=True, compute_intensity=False,
            record_scattering_orders=0, use_ray_tracing=False,
            need_volume_absorption=True)
        assert any("3D tally" in r for r in reasons)


class TestSWTransport:
    def test_energy_conservation_no_rr(self, scene):
        dom, _, _ = scene
        out = ps.run_batch_pallas_sep(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(0, 0), SMALL, 2, use_russian_roulette=False)
        fu, fd, ac, az, n, nbad, _ = out
        n = int(n)
        assert n == 8 * 128 * 2
        assert int(nbad) == 0
        bal = (float(fu.sum()) + 0.8 * float(fd.sum())
               + float(ac.sum())) / n
        assert bal == pytest.approx(1.0, abs=2e-3)
        assert float(az.sum()) == pytest.approx(float(ac.sum()), rel=1e-4)

    def test_matches_xla_kernel_statistically(self, scene):
        dom, _, _ = scene
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(9, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = ps.run_batch_pallas_sep(
            dom, Surface.lambertian(0.2),
            illumination.directional(0.5, 0.0),
            rng.batch_key(9, 1), pcfg, 32)
        fu, fd, ac, az, n, nbad, _ = out
        n = int(n)
        assert n == cfg.photons_per_batch
        for a, b, name, p in (
                (fu, t.flux_up, "R", 0.3),
                (fd, t.flux_down, "T", 0.5),
                (ac, t.flux_absorbed, "A", 0.3)):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / int(t.n_photons)
            sigma = 2.0 * np.sqrt(max(p * (1 - p), 0.01) / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        prof_ref = np.asarray(t.volume_absorption).sum(axis=(0, 1)) \
            / int(t.n_photons)
        prof = np.asarray(az) / n
        np.testing.assert_allclose(prof, prof_ref, atol=6e-3)

    def test_deterministic(self, scene):
        dom, _, _ = scene
        args = (dom, Surface.lambertian(0.2),
                illumination.directional(0.5, 0.0))
        a = ps.run_batch_pallas_sep(*args, rng.batch_key(3, 5), SMALL, 2)
        b = ps.run_batch_pallas_sep(*args, rng.batch_key(3, 5), SMALL, 2)
        c = ps.run_batch_pallas_sep(*args, rng.batch_key(3, 6), SMALL, 2)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.any(np.asarray(a[0]) != np.asarray(c[0]))


class TestLWEmission:
    """In-kernel separable BBEmission vs the XLA kernel's voxel-alias
    sampling: same emission density (kabs * B(T(z)) factorized), same
    pre-credit accounting."""

    def test_matches_xla_lw(self, scene, lw_source):
        dom, _, _ = scene
        sfc = Surface.lambertian(0.05)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                           max_steps=20_000, use_pallas="off",
                           lw_mode=True)
        t = run_batch(dom, sfc, lw_source, rng.batch_key(21, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = ps.run_batch_pallas_sep(
            dom, sfc, lw_source, rng.batch_key(21, 1), pcfg, 32,
            lw_mode=True)
        fu, fd, ac, az, n, nbad, _ = out
        n = int(n)
        assert n == cfg.photons_per_batch
        assert int(nbad) == 0
        nx = int(t.n_photons)
        for a, b, name, p in (
                (fu, t.flux_up, "up", 0.5),
                (fd, t.flux_down, "down", 0.5)):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / nx
            sigma = 2.0 * np.sqrt(max(p * (1 - p), 0.01) / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        # NET column absorption (abs - emission pre-credits) vs the XLA
        # kernel's pre-credited volume field
        net_ref = float(np.asarray(t.volume_absorption).sum()) / nx
        net = float(np.asarray(ac).sum()) / n
        sigma = 2.0 * np.sqrt(1.0 / n)
        assert net == pytest.approx(net_ref, abs=4 * sigma)
        prof_ref = np.asarray(t.volume_absorption).sum(axis=(0, 1)) / nx
        prof = np.asarray(az) / n
        np.testing.assert_allclose(prof, prof_ref, atol=6e-3)
        # z profile is the z-marginal of the column field
        assert float(az.sum()) == pytest.approx(float(ac.sum()), rel=1e-3)

    def test_emission_spatial_distribution(self):
        """The in-kernel separable BBEmission alias sampling must place
        births with the right COLUMN structure. An A/B against the XLA
        kernel's net field carries no signal at reachable photon counts
        (the net of an LTE-ish scene is a small difference of large
        numbers: measured XLA self-correlation across seeds is ~0.03), so
        instead make the domain optically THIN -- nearly every photon
        escapes, the net column field is ~(-1) x the emission column
        marginal, and that marginal is ANALYTIC from the separable
        density a[col]*P1[z] + Q1[z] (see _pack_sep_emission)."""
        from mcbrat3d_tpu.core.planck import planck_radiance

        dom, comps, temps = make_sep_scene(cloud_beta_max=0.3,
                                           gas_beta0=0.006)
        kabs = absorption_coefficient(comps, dom.grid)
        # surface emissivity 0: every photon is atmospheric, so the net
        # column field is pure (-emission + small in-domain absorption)
        w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.0, 10.0)
        src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                    dom.grid.shape)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = ps.run_batch_pallas_sep(
            dom, Surface.lambertian(0.05), src, rng.batch_key(31, 1),
            pcfg, 32, lw_mode=True)
        got = -np.asarray(out[2]).reshape(-1) / int(out[4])

        a = np.asarray(dom.sep_amp, np.float64)
        p = np.asarray(dom.sep_pz, np.float64)
        q = np.asarray(dom.sep_qz, np.float64)
        tz = np.asarray(dom.sep_tz, np.float64)
        ssa_c = float(np.asarray(dom.sep_scalars)[0])
        b = planck_radiance(dom.lambda_um, np.maximum(tz, 1.0))
        p1s = float((p * (1.0 - ssa_c) * b).sum())
        q1s = float((q * b).sum())
        dens = a * p1s + q1s
        dens *= float(src.atms_fraction) / dens.sum()

        c = np.corrcoef(dens, got)[0, 1]
        assert c > 0.95, f"emission column-marginal correlation {c}"
        # thin-limit magnitude: total net = -(emitted - absorbed), with
        # ~10% of the emitted power reabsorbed at these optical depths
        assert 0.75 * dens.sum() < got.sum() <= 1.001 * dens.sum()


class TestMultiSlice:
    """Columns beyond 16384 live in higher SLICES of the factorized
    gather (col = sl*16384 + hi*128 + lo) -- the flagship's whole point
    (105,625 columns = 7 slices). 132x132 = 17,424 columns exercises
    slice 1 for the amplitude gather, the emission alias, the tallies,
    and the pre-credits, without an (unaffordable) XLA reference run:
    correctness anchors are energy conservation and the ANALYTIC
    emission column marginal."""

    def test_two_slice_emission_and_conservation(self):
        from mcbrat3d_tpu.core.planck import planck_radiance

        dom, comps, temps = make_sep_scene(
            nx=132, ny=132, nz=60, cloud_base_level=20,
            cloud_top_level=35, cloud_beta_max=0.3, gas_beta0=0.006)
        assert dom.sep_template
        assert dom.sep_amp.shape == (132 * 132,)
        kabs = absorption_coefficient(comps, dom.grid)
        w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.0, 10.0)
        src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                    dom.grid.shape)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = ps.run_batch_pallas_sep(
            dom, Surface.lambertian(0.05), src, rng.batch_key(71, 1),
            pcfg, 32, lw_mode=True)
        fu, fd, ac, az, n, nbad, _ = out
        n = int(n)
        assert n == 8 * 128 * 32
        assert int(nbad) == 0
        # thin all-atmosphere LW conservation: emitted (1/photon) =
        # fu + (1-albedo)*fd + absorbed_gross, and the NET column field
        # gives absorbed_gross = n*(1 - sum(-ac)/n), so
        # fu/n + 0.95*fd/n == sum(-ac)/n
        got = -np.asarray(ac).reshape(-1) / n
        lhs = (float(fu.sum()) + 0.95 * float(fd.sum())) / n
        assert lhs == pytest.approx(got.sum(), abs=5e-3)

        a = np.asarray(dom.sep_amp, np.float64)
        p = np.asarray(dom.sep_pz, np.float64)
        q = np.asarray(dom.sep_qz, np.float64)
        tz = np.asarray(dom.sep_tz, np.float64)
        ssa_c = float(np.asarray(dom.sep_scalars)[0])
        b = planck_radiance(dom.lambda_um, np.maximum(tz, 1.0))
        dens = (a * float((p * (1.0 - ssa_c) * b).sum())
                + float((q * b).sum()))
        dens /= dens.sum()
        # ~2 photons/column is far too few for per-column (or even
        # 128-column-group) correlations -- measured same-kernel
        # cross-seed group correlation is only ~0.45 at this budget.
        # The SLICE SHARE is the powered statistic: a slicing bug in the
        # factorized gather/alias would mis-route slice-1 columns
        # wholesale, while in-domain absorption scales both slices by
        # the same escape factor (measured 0.938 on both).
        s1_got = got[16384:].sum()
        r_got = s1_got / got.sum()
        r_dens = dens[16384:].sum()
        sigma = np.sqrt(max(r_dens * n, 1.0)) / n
        assert r_got == pytest.approx(r_dens, abs=5 * sigma + 0.005), (
            f"slice-1 emission share {r_got} vs {r_dens}")


class TestHiFirstAmpGather:
    """The hi-first amplitude gather (m_ampT layout) is the DEFAULT on
    multi-slice domains; debug_parts='oldamp' forces the per-slice
    sliced form. Same table values, same RNG streams => every tally
    must be BITWISE identical across the two forms; the
    'dblamp'/'dbltally' measurement duplicates must not perturb tallies
    at all (their dots feed only the nstat scalar sink)."""

    @pytest.mark.parametrize("parts", ["oldamp", "dblamp,dbltally"])
    def test_bitwise_vs_default(self, parts):
        dom, comps, temps = make_sep_scene(
            nx=132, ny=132, nz=60, cloud_base_level=20,
            cloud_top_level=35, cloud_beta_max=0.3, gas_beta0=0.006)
        kabs = absorption_coefficient(comps, dom.grid)
        w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.0, 10.0)
        src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                    dom.grid.shape)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=16,
                            max_steps=2048, interpret=True)
        outs = []
        for dp in ("", parts):
            import dataclasses
            cfg = dataclasses.replace(pcfg, debug_parts=dp)
            fu, fd, ac, az, n, nbad, _ = ps.run_batch_pallas_sep(
                dom, Surface.lambertian(0.05), src, rng.batch_key(71, 2),
                cfg, 4, lw_mode=True)
            outs.append((np.asarray(fu), np.asarray(fd), np.asarray(ac),
                         np.asarray(az), int(n)))
        for a, b in zip(outs[0], outs[1]):
            np.testing.assert_array_equal(a, b)


class TestCompactDomain:
    """build_domain(device_fields='compact') skips the ~1 GB/bin per-cell
    device arrays at flagship scale; the separable megakernel only reads
    the sep_* tables, so a compact domain must run IDENTICALLY to the
    full build, and illumination.emission_separable must reproduce
    emission_weighting's power split without the per-voxel Planck CDF
    (broadband rebuild loop; reference: Drivers/monteCarloDriver.f95:889-1129)."""

    @pytest.fixture(scope="class")
    def pair(self):
        grid, comps, temps = lw_flagship_scene(
            nx=16, ny=16, nz=150, cloud_base_level=55, cloud_top_level=85)
        kw = dict(temps=temps, macro_factor=8, n_cdf_steps=201,
                  lambda_um=10.0)
        full = build_domain(grid, comps, **kw)
        compact = build_domain(grid, comps, device_fields="compact", **kw)
        return full, compact, comps, temps

    def test_tables_match_full_build(self, pair):
        full, compact, _, _ = pair
        assert compact.cell_records is None
        assert compact.total_ext is None and compact.cum_ext is None
        assert compact.sep_template
        assert compact.n_components == full.n_components
        for f in ("sep_amp", "sep_pz", "sep_qz", "sep_block", "sep_tz",
                  "sep_scalars", "sep_em_prob", "sep_em_alias",
                  "sep_em_zpa", "sep_em_pb"):
            np.testing.assert_array_equal(
                np.asarray(getattr(full, f)),
                np.asarray(getattr(compact, f)), err_msg=f)
        assert (full.sep_zb, full.sep_zt) == (compact.sep_zb, compact.sep_zt)
        assert full.sep_analytic_hg == compact.sep_analytic_hg
        assert full.uniform_ssa == compact.uniform_ssa
        assert compact.sep_em_atm == pytest.approx(full.sep_em_atm)
        assert compact.sep_em_atm > 0.0

    def test_sw_run_bitwise_matches_full(self, pair):
        full, compact, _, _ = pair
        cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2,
                           max_steps=4096, use_pallas="on",
                           need_volume_absorption=False)
        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        a = run_batch(full, sfc, src, rng.batch_key(5, 0), cfg)
        b = run_batch(compact, sfc, src, rng.batch_key(5, 0), cfg)
        np.testing.assert_array_equal(np.asarray(a.flux_up),
                                      np.asarray(b.flux_up))
        np.testing.assert_array_equal(np.asarray(a.flux_down),
                                      np.asarray(b.flux_down))
        np.testing.assert_array_equal(np.asarray(a.absorption_profile),
                                      np.asarray(b.absorption_profile))

    def test_emission_separable_power_split(self, pair):
        full, compact, comps, temps = pair
        kabs = absorption_coefficient(comps, full.grid)
        w = emission_weighting(full.grid, temps, kabs, 288.0, 0.95, 10.0)
        src = illumination.emission_separable(compact, 288.0, 0.95)
        assert src.em_sep and src.voxel_cdf is None and src.em_prob is None
        assert float(src.atms_fraction) == pytest.approx(
            w.frac_atms_power, rel=1e-5)

    def test_lw_run_matches_full_alias_emission(self, pair):
        # Drive the kernel entry with TestLWEmission's proven small
        # launch geometry (rows=8): a fresh production-size interpret
        # compile here has crashed XLA's CPU backend late in long suite
        # processes (cumulative LLVM JIT state; fine standalone). The
        # production-geometry dispatch itself is covered by
        # test_sw_run_bitwise_matches_full + the TPU verify recipe.
        full, compact, comps, temps = pair
        kabs = absorption_coefficient(comps, full.grid)
        w = emission_weighting(full.grid, temps, kabs, 288.0, 0.95, 10.0)
        src_full = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                         full.grid.shape)
        src_sep = illumination.emission_separable(compact, 288.0, 0.95)
        sfc = Surface.lambertian(0.05)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out_a = ps.run_batch_pallas_sep(full, sfc, src_full,
                                        rng.batch_key(41, 0), pcfg, 16,
                                        lw_mode=True)
        out_b = ps.run_batch_pallas_sep(compact, sfc, src_sep,
                                        rng.batch_key(41, 1), pcfg, 16,
                                        lw_mode=True)
        na, nb = int(out_a[4]), int(out_b[4])
        assert na == nb == 8 * 128 * 16
        for fa, fb, name in ((out_a[0], out_b[0], "up"),
                             (out_a[1], out_b[1], "down")):
            ra = float(np.asarray(fa).sum()) / na
            rb = float(np.asarray(fb).sum()) / nb
            sigma = 2.0 * np.sqrt(0.25 / na + 0.25 / nb)
            assert ra == pytest.approx(rb, abs=4 * sigma), name
        pa = np.asarray(out_a[3]) / na
        pb = np.asarray(out_b[3]) / nb
        np.testing.assert_allclose(pa, pb, atol=8e-3)

    def test_compact_rejects_nonseparable(self):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import OpticalComponent
        from mcbrat3d_tpu.physics.phase_function import (
            PhaseFunction,
            PhaseFunctionTable,
        )
        r = np.random.RandomState(3)
        ext = 0.5 + r.rand(8, 8, 12)  # full-rank 3D field: not separable
        table = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 32)], key=[1.0])
        comp = OpticalComponent(
            name="random", extinction=ext,
            single_scattering_albedo=np.full_like(ext, 0.9),
            phase_function_index=np.zeros(ext.shape, np.int32),
            phase_function_table=table)
        with pytest.raises(ValueError, match="separable"):
            build_domain(Grid.regular(8, 8, 12, 0.1, 0.1, 0.1), [comp],
                         device_fields="compact")

    def test_compact_off_pallas_raises(self, pair):
        _, compact, _, _ = pair
        cfg = KernelConfig(n_lanes=256, photons_per_lane=1, max_steps=512,
                           use_pallas="off", need_volume_absorption=False)
        with pytest.raises(ValueError, match="compact"):
            run_batch(compact, Surface.lambertian(0.2),
                      illumination.directional(0.5, 0.0),
                      rng.batch_key(0, 0), cfg)


def test_public_dispatch_use_pallas_on():
    """run_batch routes separable domains beyond the record envelope
    through the separable kernel when use_pallas='on'."""
    dom, comps, temps = make_sep_scene()
    kabs = absorption_coefficient(comps, dom.grid)
    w = emission_weighting(dom.grid, temps, kabs, 288.0, 0.95, 10.0)
    src = illumination.emission(w.voxel_cdf, w.frac_atms_power,
                                dom.grid.shape)
    cfg = KernelConfig(n_lanes=1 << 10, photons_per_lane=2, max_steps=4096,
                       use_pallas="on", lw_mode=True,
                       need_volume_absorption=False)
    t = run_batch(dom, Surface.lambertian(0.05), src,
                  rng.batch_key(1, 0), cfg)
    assert t.volume_absorption is None  # the separable-kernel signature
    assert t.absorption_profile is not None
    assert int(t.n_photons) == cfg.photons_per_batch


class TestGasOnlyDegenerateBin:
    """A zero-cloud-extinction bin built from a SeparableBinPlan (p=0,
    gas-only transport) must match the XLA kernel on the generic full
    domain for the same bin -- the field-level equivalence chain breaks
    here (the generic rank-1 detection rejects a zero cloud field), so
    the proof is a direct statistical transport A/B."""

    def test_plan_p0_matches_xla(self):
        import dataclasses

        from mcbrat3d_tpu.domain.sep_plan import (
            build_domain_from_plan, make_separable_bin_plan)
        from mcbrat3d_tpu.domain.ssp import components_from_ssp
        from mcbrat3d_tpu.scenes.collection import lw_flagship_physical

        common, tbl, _ = lw_flagship_physical(
            nx=16, ny=16, nz=48, cloud_base_level=12, cloud_top_level=28,
            n_lambda=3, seed=7)
        comps_t = list(tbl.components)
        ci = next(i for i, c in enumerate(comps_t)
                  if c.ext_type == "volExt")
        ext = comps_t[ci].extinction.copy()
        ext[:, 1] = 0.0
        comps_t[ci] = dataclasses.replace(comps_t[ci], extinction=ext)
        tbl = dataclasses.replace(tbl, components=comps_t)

        plan = make_separable_bin_plan(common, [tbl],
                                       calc_rayleigh=False, macro_factor=4)
        assert plan is not None
        lam = float(tbl.lambdas_um[1])
        dom_p = build_domain_from_plan(common.grid, plan, 1, lam,
                                       n_cdf_steps=201)
        assert dom_p is not None
        assert float(np.asarray(dom_p.sep_pz).max()) == 0.0

        comps, _, _ = components_from_ssp(common, [tbl], 1, setup=False,
                                          calc_rayleigh=False)
        dom_f = build_domain(common.grid, comps, temps=common.temps,
                             macro_factor=4, n_cdf_steps=201,
                             lambda_um=lam)

        sfc = Surface.lambertian(0.2)
        src = illumination.directional(0.5, 0.0)
        cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=8,
                           max_steps=20_000, use_pallas="off")
        t = run_batch(dom_f, sfc, src, rng.batch_key(9, 0), cfg)
        pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                            max_steps=20_000, interpret=True)
        out = ps.run_batch_pallas_sep(dom_p, sfc, src,
                                      rng.batch_key(9, 1), pcfg, 32)
        fu, fd, ac, az, n, nbad, _ = out
        n = int(n)
        assert n == cfg.photons_per_batch
        assert int(nbad) == 0
        nx = int(t.n_photons)
        for a, b, name, p in (
                (fu, t.flux_up, "R", 0.1),
                (fd, t.flux_down, "T", 0.7),
                (ac, t.flux_absorbed, "A", 0.3)):
            ra = float(np.asarray(a).sum()) / n
            rb = float(np.asarray(b).sum()) / nx
            sigma = 2.0 * np.sqrt(max(p * (1 - p), 0.01) / n)
            assert ra == pytest.approx(rb, abs=4 * sigma), name


class TestGroupRejectionEmission:
    """Round-4 emission refill rework: the per-column sliced alias
    gather (4 fields x n_sl slices per step) is replaced by a group-
    proposal + rejection sampler that reuses the collision amp gather
    (_pack_sep_emission_groups). debug_parts='oldem' keeps the alias
    path as the A/B control."""

    def test_group_tables_sample_amp_exactly(self, scene):
        """Host-side simulation of the in-kernel sampler against the
        exact amp marginal (chi-square-free z-score bound)."""
        dom, _, _ = scene
        m = np.asarray(ps._pack_sep_emission_groups(dom))
        amp = np.asarray(dom.sep_amp, np.float64)
        nxy = amp.size
        n_g = -(-nxy // 128)
        prob = m[0:8].reshape(-1)[:n_g]
        alias = m[8:16].reshape(-1)[:n_g].astype(int)
        gmax = m[16:24].reshape(-1)[:n_g]
        r = np.random.default_rng(0)
        n = 1_000_000
        j = r.integers(0, n_g, n)
        g = np.where(r.random(n) < prob[j], j, alias[j])
        col = g * 128 + r.integers(0, 128, n)
        keep = r.random(n) * gmax[g] < np.pad(amp, (0, n_g * 128 - nxy))[col]
        hist = np.bincount(col[keep], minlength=n_g * 128)[:nxy]
        expect = amp / amp.sum() * keep.sum()
        big = expect > 100
        z = (hist[big] - expect[big]) / np.sqrt(expect[big])
        assert np.abs(z).max() < 5.0

    def test_matches_oldem_statistically(self, scene, lw_source):
        """Same LW run through both refill samplers: fluxes and net
        absorption must agree statistically (the round-4 branch-commit
        bug -- restart-on-reject reweighting the atm/cloud branch splits
        by their acceptance rates -- showed up as a 40% flux_down excess
        here)."""
        dom, _, _ = scene
        sfc = Surface.lambertian(0.05)
        res = {}
        for parts in ("", "oldem"):
            pcfg = PallasConfig(rows=8, block_rows=8, steps_per_call=32,
                                max_steps=20_000, interpret=True,
                                debug_parts=parts)
            out = ps.run_batch_pallas_sep(dom, sfc, lw_source,
                                          rng.batch_key(21, 1), pcfg, 32,
                                          lw_mode=True)
            fu, fd, ac, az, n, nbad, _ = out
            n = int(n)
            assert n == 8 * 128 * 32
            assert int(nbad) == 0
            res[parts] = [float(np.asarray(v).sum()) / n
                          for v in (fu, fd, ac)]
        for a, b, name in zip(res[""], res["oldem"],
                              ("up", "down", "net_abs")):
            sigma = 2.0 * np.sqrt(0.01 / (8 * 128 * 32))
            assert a == pytest.approx(b, abs=6 * sigma), name
