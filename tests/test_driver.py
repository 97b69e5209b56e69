"""Driver-layer tests: namelist parsing, batch statistics, outputs,
checkpoint/resume, CLI."""

import json
import os

import numpy as np
import pytest

from mcbrat3d_tpu.core.accumulate import MomentAccumulator
from mcbrat3d_tpu.driver import checkpoint as ckpt
from mcbrat3d_tpu.driver.config import (
    SimulationConfig,
    config_from_namelist,
    parse_namelist,
)
from mcbrat3d_tpu.driver.run import run_simulation
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.sources import illumination

NAMELIST = """
&radiativeTransfer
  solarMu = 0.707
  solarAzimuth = 30.
  LW_flag = -1.
  numLambda = 1
  intensityMus(1) = 0.5, intensityMus(2) = 1.0
  intensityPhis(1) = 0., intensityPhis(2) = 45.
/
&monteCarlo
  numPhotonsPerBatch = 100000
  numBatches = 8
  iseed = 42
  nPhaseIntervals = 501
/
&algorithms
  useRayTracing = .false.
  useRussianRoulette = .true.
  zetaMin = 0.25
/
&output
  reportVolumeAbsorption = .true.
/
&fileNames
  domainFileName = 'test.dom'
  outputFluxFile = "flux.out"
/
"""


class TestNamelist:
    def test_parse_groups(self):
        groups = parse_namelist(NAMELIST)
        assert set(groups) == {"radiativetransfer", "montecarlo",
                               "algorithms", "output", "filenames"}
        assert groups["montecarlo"]["numbatches"] == 8
        assert groups["algorithms"]["useraytracing"] is False

    def test_config_mapping(self):
        cfg = config_from_namelist(NAMELIST)
        assert cfg.solar_mu == pytest.approx(0.707)
        assert cfg.num_batches == 8
        assert cfg.iseed == 42
        assert cfg.zeta_min == pytest.approx(0.25)
        assert cfg.domain_file == "test.dom"
        assert cfg.output_flux_file == "flux.out"
        mus, phis = cfg.radiance_directions()
        np.testing.assert_allclose(mus, [0.5, 1.0])
        np.testing.assert_allclose(phis, [0.0, 45.0])

    def test_angle_fill(self):
        cfg = SimulationConfig(angle_fill=True,
                               theta_fill=[0.0, 60.0, 30.0],
                               phi_fill=[0.0, 90.0, 90.0])
        mus, phis = cfg.radiance_directions()
        assert mus.size == 6  # 3 thetas x 2 phis
        np.testing.assert_allclose(mus[:2], np.cos(np.deg2rad([0.0, 0.0])))
        np.testing.assert_allclose(phis[:2], [0.0, 90.0])

    def test_repeat_values(self):
        groups = parse_namelist("&g a = 3*1.5 /")
        assert groups["g"]["a"] == [1.5, 1.5, 1.5]


def small_cfg(**kw):
    base = dict(num_photons_per_batch=1 << 12, num_batches=4, iseed=1,
                n_lanes=1 << 10, max_steps=2000)
    base.update(kw)
    return SimulationConfig(**base)


class TestRunSimulation:
    def test_exact_photon_count_non_lane_multiple(self):
        """numPhotonsPerBatch must be honored exactly even when it is not a
        multiple of n_lanes (the lane quotas clamp to the traced count)."""
        dom = make_slab(tau=1.0, ssa=0.9, n_cdf_steps=201)
        cfg = small_cfg(num_photons_per_batch=3000, num_batches=2,
                        n_lanes=1 << 10)  # 3000 = 2.93 * 1024
        res = run_simulation(dom, Surface.lambertian(0.0),
                             illumination.directional(1.0, 0.0), cfg)
        assert res.total_photons == 2 * 3000

    def test_stats_and_conservation(self):
        dom = make_slab(tau=1.0, ssa=0.9, n_cdf_steps=201)
        cfg = small_cfg()
        res = run_simulation(dom, Surface.lambertian(0.0),
                             illumination.directional(1.0, 0.0), cfg)
        assert res.total_photons == 4 * (1 << 12)
        assert res.n_batches == 4
        total = (res.mean["mean_flux_up"] + res.mean["mean_flux_down"]
                 + res.mean["mean_flux_absorbed"])
        assert total == pytest.approx(1.0, rel=1e-3)
        # stderr should be positive and small relative to the mean
        assert 0 < res.stderr["mean_flux_up"] < 0.2 * res.mean["mean_flux_up"]

    def test_solar_flux_scaling(self):
        dom = make_slab(tau=1.0, ssa=1.0, n_cdf_steps=201)
        cfg = small_cfg()
        r1 = run_simulation(dom, Surface.lambertian(0.0),
                            illumination.directional(1.0, 0.0), cfg,
                            solar_flux=1.0)
        r2 = run_simulation(dom, Surface.lambertian(0.0),
                            illumination.directional(1.0, 0.0), cfg,
                            solar_flux=100.0)
        np.testing.assert_allclose(r2.mean["flux_up"],
                                   100.0 * r1.mean["flux_up"], rtol=1e-12)

    def test_checkpoint_resume_identical(self, tmp_path):
        dom = make_slab(tau=1.0, ssa=0.9, n_cdf_steps=201)
        cfg = small_cfg(num_batches=6)
        src = illumination.directional(1.0, 0.0)
        sfc = Surface.lambertian(0.0)

        full = run_simulation(dom, sfc, src, cfg)

        # Run 3 batches, checkpoint, resume for the remaining 3
        cfg_half = small_cfg(num_batches=3)
        half = run_simulation(dom, sfc, src, cfg_half)
        path = str(tmp_path / "ck.npz")
        acc = MomentAccumulator()
        # rebuild accumulator through the checkpoint API
        cfg_ck = small_cfg(num_batches=3, checkpoint_every_batches=3)
        run_simulation(dom, sfc, src, cfg_ck, accumulator=acc,
                       checkpoint_cb=lambda b, a, c: ckpt.save_checkpoint(path, b, a, c))
        next_batch, acc2 = ckpt.load_checkpoint(path)
        assert next_batch == 3
        resumed = run_simulation(dom, sfc, src, cfg, accumulator=acc2,
                                 start_batch=next_batch)
        np.testing.assert_allclose(resumed.mean["flux_up"],
                                   full.mean["flux_up"], rtol=1e-12)
        np.testing.assert_allclose(resumed.stderr["flux_up"],
                                   full.stderr["flux_up"], rtol=1e-9)


class TestEndToEndCLI:
    def test_mkdomain_and_run(self, tmp_path):
        from mcbrat3d_tpu.driver.cli import main as cli_main
        dom_path = str(tmp_path / "step.dom")
        rc = cli_main(["mkdomain", "step_cloud", dom_path, "ssa=0.99"])
        assert rc == 0 and os.path.exists(dom_path)

        flux_path = str(tmp_path / "flux.out")
        nc_path = str(tmp_path / "results.nc")
        nml = tmp_path / "run.nml"
        nml.write_text(f"""
&radiativeTransfer
  solarMu = 0.5
/
&monteCarlo
  numPhotonsPerBatch = 4096
  numBatches = 3
  iseed = 7
  nPhaseIntervals = 501
/
&algorithms
  useRayTracing = .false.
/
&fileNames
  domainFileName = '{dom_path}'
  outputFluxFile = '{flux_path}'
  outputNetcdfFile = '{nc_path}'
/
""")
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli_main(["run", str(nml)])
        assert rc == 0
        info = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert info["total_photons"] == 3 * 4096
        assert os.path.exists(flux_path)
        assert os.path.exists(nc_path)
        # netCDF results sanity
        from scipy.io import netcdf_file
        with netcdf_file(nc_path, "r", mmap=False) as nc:
            up = np.array(nc.variables["fluxUp"][:])
            assert up.shape == (1, 32)  # (y, x) file order
            assert np.all(up >= 0)
            assert int(nc.totalPhotons) == 3 * 4096

        # analysis-deck equivalent: the summary must parse the file and
        # carry the photon count and a sane energy budget
        from mcbrat3d_tpu.tools.analyze_results import summarize
        rep = summarize(nc_path)
        assert "totalPhotons" in rep and "fluxUp" in rep
        assert "energy budget" in rep


class TestAutoMesh:
    def test_auto_mesh_uses_all_devices(self):
        import jax
        from mcbrat3d_tpu.scenes.plane_parallel import make_slab
        from mcbrat3d_tpu.physics.surface import Surface
        from mcbrat3d_tpu.sources import illumination
        dom = make_slab(tau=1.0, ssa=1.0, n_cdf_steps=201)
        cfg = small_cfg(num_photons_per_batch=1 << 13, num_batches=2,
                        n_lanes=1 << 9)
        res = run_simulation(dom, Surface.lambertian(0.0),
                             illumination.directional(1.0, 0.0), cfg,
                             mesh="auto")
        # global batch size preserved (split across the 8 CPU devices)
        assert res.total_photons == 2 * (1 << 13)
        total = (res.mean["mean_flux_up"] + res.mean["mean_flux_down"])
        assert total == pytest.approx(1.0, rel=1e-3)


class TestScatOrderOutputs:
    def test_aux_flux_file(self, tmp_path):
        from mcbrat3d_tpu.driver import output as out_mod
        from mcbrat3d_tpu.scenes.plane_parallel import make_slab
        from mcbrat3d_tpu.physics.surface import Surface
        from mcbrat3d_tpu.sources import illumination
        dom = make_slab(tau=1.0, ssa=1.0, n_cdf_steps=201)
        aux = str(tmp_path / "aux_flux.out")
        cfg = small_cfg(rec_scat_ord=True, num_rec_scat_ord=4,
                        auxhist01_flux_file=aux)
        res = run_simulation(dom, Surface.lambertian(0.0),
                             illumination.directional(1.0, 0.0), cfg)
        assert "flux_up_by_order" in res.mean
        # per-order sums equal totals
        np.testing.assert_allclose(
            res.mean["flux_up_by_order"].sum(axis=2),
            res.mean["flux_up"], rtol=1e-4)
        res.grid = dom.grid
        written = out_mod.write_all(res, dom.grid)
        assert aux in written and os.path.getsize(aux) > 0


class TestCLICheckpoint:
    def test_run_resume_via_namelist(self, tmp_path):
        """checkpointFile/checkpointEveryBatches namelist knobs: a second
        invocation resumes from the saved state and matches an uninterrupted
        run bitwise."""
        from mcbrat3d_tpu.driver.cli import main as cli_main
        import io
        from contextlib import redirect_stdout

        dom_path = str(tmp_path / "step.dom")
        cli_main(["mkdomain", "step_cloud", dom_path, "ssa=0.99"])
        ck = str(tmp_path / "run.ck.npz")
        nc_full = str(tmp_path / "full.nc")
        nc_res = str(tmp_path / "resumed.nc")

        def nml(n_batches, out, with_ck):
            p = tmp_path / f"r{n_batches}{with_ck}.nml"
            ck_lines = (f"  checkpointFile = '{ck}'\n"
                        "  checkpointEveryBatches = 1\n") if with_ck else ""
            p.write_text(f"""
&radiativeTransfer
  solarMu = 0.5
/
&monteCarlo
  numPhotonsPerBatch = 4096
  numBatches = {n_batches}
  iseed = 7
  nPhaseIntervals = 501
{ck_lines}/
&fileNames
  domainFileName = '{dom_path}'
  outputNetcdfFile = '{out}'
/
""")
            return str(p)

        buf = io.StringIO()
        with redirect_stdout(buf):
            # uninterrupted 4-batch run
            cli_main(["run", nml(4, nc_full, False)])
            # 2-batch run with checkpointing, then resumed 4-batch run
            cli_main(["run", nml(2, str(tmp_path / "x.nc"), True)])
            cli_main(["run", nml(4, nc_res, True)])

        from scipy.io import netcdf_file
        with netcdf_file(nc_full, "r", mmap=False) as a, \
                netcdf_file(nc_res, "r", mmap=False) as b:
            np.testing.assert_allclose(np.array(b.variables["fluxUp"][:]),
                                       np.array(a.variables["fluxUp"][:]),
                                       rtol=1e-12)
            assert float(b.totalPhotons) == float(a.totalPhotons)
