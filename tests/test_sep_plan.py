"""Factorized per-bin rebuild (domain/sep_plan.py) equivalence tests.

The plan path must produce bit-compatible compact domains with the
generic components_from_ssp + build_domain(device_fields='compact')
route it replaces -- the generic route is itself A/B-proven against the
full per-cell path (tests/test_pallas_sep.py TestCompactDomain), so
field-level equivalence here chains the proof.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.domain.sep_plan import (build_domain_from_plan,
                                          make_separable_bin_plan)
from mcbrat3d_tpu.domain.ssp import components_from_ssp
from mcbrat3d_tpu.scenes.collection import lw_flagship_physical


@pytest.fixture(scope="module")
def scene():
    common, tbl, _ = lw_flagship_physical(
        nx=8, ny=8, nz=24, cloud_base_level=6, cloud_top_level=14,
        n_lambda=5, seed=3)
    return common, tbl


@pytest.fixture(scope="module")
def plan(scene):
    common, tbl = scene
    p = make_separable_bin_plan(common, [tbl], calc_rayleigh=False,
                                macro_factor=4)
    assert p is not None
    return p


class TestPlanEquivalence:
    @pytest.mark.parametrize("li", [0, 2, 4])
    def test_matches_generic_compact_build(self, scene, plan, li):
        common, tbl = scene
        grid = common.grid
        comps, albedo, lam_um = components_from_ssp(
            common, [tbl], li, setup=False, calc_rayleigh=False)
        ref = build_domain(grid, comps, device_fields="compact",
                           n_cdf_steps=501, temps=common.temps,
                           macro_factor=4, lambda_um=lam_um)
        got = build_domain_from_plan(grid, plan, li, lam_um,
                                     n_cdf_steps=501)
        assert got is not None
        assert float(got.lambda_um) == lam_um
        # static structure
        assert got.sep_template and got.sep_tz_uniform
        assert (got.sep_zb, got.sep_zt) == (ref.sep_zb, ref.sep_zt)
        assert got.sep_inv_row == ref.sep_inv_row
        assert got.sep_analytic_hg == ref.sep_analytic_hg
        assert got.all_hg == ref.all_hg
        assert got.ncomp_hint == ref.ncomp_hint
        assert got.uniform_ssa == ref.uniform_ssa
        assert got.uniform_hg == ref.uniform_hg
        # separable fields (generic path computes amp/p in f32 from the
        # per-cell extinction; the plan from mass x scalar -- equal to
        # f32 rounding)
        for name in ("sep_amp", "sep_pz", "sep_qz", "sep_block",
                     "sep_tz", "sep_scalars"):
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(got, name))
            np.testing.assert_allclose(b, a, rtol=3e-6, atol=1e-12,
                                       err_msg=name)
        # phase tables
        np.testing.assert_array_equal(np.asarray(got.tables.offsets),
                                      np.asarray(ref.tables.offsets))
        np.testing.assert_allclose(np.asarray(got.tables.inverse),
                                   np.asarray(ref.tables.inverse),
                                   rtol=2e-5, atol=1e-7)
        # emission tables
        for name in ("sep_em_prob", "sep_em_alias", "sep_em_zpa",
                     "sep_em_pb"):
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(got, name))
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6,
                                       err_msg=name)
        assert got.sep_em_atm == pytest.approx(ref.sep_em_atm, rel=1e-5)

    def test_lw_setup_fluxes_matches_generic(self, scene, plan):
        from mcbrat3d_tpu.spectral.weights import (lambda_widths,
                                                   lw_setup_fluxes)
        common, tbl = scene
        d_lambda = lambda_widths(tbl.lambdas_um)
        ref = lw_setup_fluxes(common, [tbl], d_lambda, 288.0)
        got = lw_setup_fluxes(common, [tbl], d_lambda, 288.0, plan=plan)
        np.testing.assert_allclose(got, ref, rtol=1e-6)
        # cold surface branch
        ref0 = lw_setup_fluxes(common, [tbl], d_lambda, 0.0)
        got0 = lw_setup_fluxes(common, [tbl], d_lambda, 0.0, plan=plan)
        np.testing.assert_allclose(got0, ref0, rtol=1e-6)


class TestPlanRejections:
    def test_rank2_mass_rejected(self, scene):
        import dataclasses
        common, tbl = scene
        mass = common.mass_conc.copy()
        # break rank-1: second independent mode
        mass[0, 0, 0, :] = np.linspace(0.1, 1.0, mass.shape[3])
        mass[0, 1, 1, ::2] = 0.7
        broken = dataclasses.replace(common, mass_conc=mass)
        assert make_separable_bin_plan(broken, [tbl], False, 4) is None

    def test_varying_reff_rejected(self, scene):
        import dataclasses
        common, tbl = scene
        reff = common.reff.copy()
        reff[0, : reff.shape[1] // 2] = 20.0
        broken = dataclasses.replace(common, reff=reff)
        assert make_separable_bin_plan(broken, [tbl], False, 4) is None

    def test_rayleigh_rejected(self, scene):
        common, tbl = scene
        assert make_separable_bin_plan(common, [tbl], True, 4) is None

    def test_nonuniform_pressure_rejected(self, scene):
        import dataclasses
        common, tbl = scene
        num = common.num_conc.copy()
        num[0, 0, :] *= 1.5
        broken = dataclasses.replace(common, num_conc=num)
        assert make_separable_bin_plan(broken, [tbl], False, 4) is None

    def test_nonuniform_temps_gives_no_emission(self, scene):
        import dataclasses
        common, tbl = scene
        temps = common.temps.copy()
        temps[0, 0, :] += 5.0
        warm = dataclasses.replace(common, temps=temps)
        plan = make_separable_bin_plan(warm, [tbl], False, 4)
        assert plan is not None and plan.tz is None
        dom = build_domain_from_plan(common.grid, plan, 0, 10.0,
                                     n_cdf_steps=501)
        assert dom.sep_em_prob is None and not dom.sep_tz_uniform


class TestBroadbandIntegration:
    def test_plan_path_engages_and_runs(self, tmp_path, monkeypatch):
        """run_broadband on a sep-class scene big enough that the record
        kernel is ineligible: the plan must be built, later bins must use
        build_domain_from_plan, and the run must produce sane LW fluxes."""
        from mcbrat3d_tpu.driver.config import SimulationConfig
        from mcbrat3d_tpu.spectral import broadband as bb

        common, tbl, _ = lw_flagship_physical(
            nx=32, ny=32, nz=48, cloud_base_level=12, cloud_top_level=28,
            n_lambda=3, seed=5)
        calls = {"n": 0}
        real = bb.build_domain_from_plan

        def spy(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(bb, "build_domain_from_plan", spy)
        cfg = SimulationConfig(
            surface_temp=288.0, num_lambda=3, lw_flag=1.0,
            calc_rayleigh=False,
            num_photons_per_batch=1 << 10, num_batches=3, iseed=5,
            n_phase_intervals=501, n_lanes=1 << 9, max_steps=4000,
            use_pallas="on", report_volume_absorption=False)
        res = bb.run_broadband(cfg, common=common, ssp_tables=[tbl])
        assert calls["n"] >= 1, "factorized rebuild never engaged"
        assert res.total_photons == 3 * (1 << 10)
        assert res.mean["mean_flux_up"] > 0
        assert res.mean["mean_flux_down"] > 0
        assert np.isfinite(res.mean["mean_flux_absorbed"])

    @staticmethod
    def _degenerate_scene(zero_gas: bool):
        """Flagship-class scene whose middle lambda bin has zero cloud
        extinction (and, with zero_gas, zero gas absorption too)."""
        import dataclasses

        common, tbl, _ = lw_flagship_physical(
            nx=32, ny=32, nz=48, cloud_base_level=12, cloud_top_level=28,
            n_lambda=3, seed=7)
        comps = list(tbl.components)
        ci = next(i for i, c in enumerate(comps) if c.ext_type == "volExt")
        ext = comps[ci].extinction.copy()
        ext[:, 1] = 0.0  # middle bin: cloud optically inert
        comps[ci] = dataclasses.replace(comps[ci], extinction=ext)
        if zero_gas:
            gi = next(i for i, c in enumerate(comps)
                      if c.ext_type == "absXsec")
            xs = comps[gi].xsec.copy()
            xs[:, 1] = 0.0  # middle bin: total vacuum
            comps[gi] = dataclasses.replace(comps[gi], xsec=xs)
        return common, dataclasses.replace(tbl, components=comps)

    @staticmethod
    def _run_spying(common, tbl, monkeypatch):
        from mcbrat3d_tpu.driver.config import SimulationConfig
        from mcbrat3d_tpu.spectral import broadband as bb

        seen = {}
        real = bb.build_domain_from_plan

        def spy(grid, plan, li, *a, **kw):
            out = real(grid, plan, li, *a, **kw)
            seen[int(li)] = out is not None
            return out

        monkeypatch.setattr(bb, "build_domain_from_plan", spy)
        cfg = SimulationConfig(
            surface_temp=288.0, num_lambda=3, lw_flag=1.0,
            calc_rayleigh=False,
            num_photons_per_batch=1 << 10, num_batches=3, iseed=7,
            n_phase_intervals=501, n_lanes=1 << 9, max_steps=4000,
            use_pallas="on", report_volume_absorption=False)
        res = bb.run_broadband(cfg, common=common, ssp_tables=[tbl])
        return seen, res

    def test_zero_cloud_bin_stays_on_plan_path(self, monkeypatch):
        """Zero cloud extinction with gas still absorbing degenerates
        cleanly to p=0 gas-only transport INSIDE the plan path."""
        common, tbl = self._degenerate_scene(zero_gas=False)
        seen, res = self._run_spying(common, tbl, monkeypatch)
        assert seen.get(1) is True, \
            "gas-only bin should build from the plan (p=0)"
        assert seen.get(2) is True
        assert res.total_photons == 3 * (1 << 10)
        assert np.isfinite(res.mean["mean_flux_absorbed"])

    def test_vacuum_bin_does_not_break_plan_path(self, monkeypatch):
        """A total-vacuum bin (plan build -> None) must fall back for
        THAT bin only -- later bins stay on the O(nz) plan path, and a
        forced use_pallas='on' must not turn the trivial bin into a
        hard error."""
        common, tbl = self._degenerate_scene(zero_gas=True)
        seen, res = self._run_spying(common, tbl, monkeypatch)
        assert seen.get(1) is False, "vacuum bin should reject the plan"
        assert seen.get(2) is True, \
            "plan path must survive a degenerate earlier bin"
        assert res.total_photons == 3 * (1 << 10)
        assert np.isfinite(res.mean["mean_flux_absorbed"])
