"""netCDF I/O roundtrip tests (reference-compatible schema)."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from mcbrat3d_tpu.domain import io_netcdf
from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.physics.phase_function import PhaseFunction, PhaseFunctionTable
from mcbrat3d_tpu.scenes.step_cloud import step_cloud_scene


class TestPhaseFunctionTableIO:
    def test_legendre_roundtrip(self, tmp_path):
        tbl = PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.85, 32),
             PhaseFunction.isotropic()],
            key=[5.0, 10.0], extinction=[1.5, 2.5],
            single_scattering_albedo=[0.9, 1.0], description="test table")
        path = str(tmp_path / "table.pft")
        io_netcdf.write_phase_function_table(tbl, path)
        back = io_netcdf.read_phase_function_table_file(path)
        assert back.n_entries == 2
        np.testing.assert_allclose(back.key, [5.0, 10.0])
        np.testing.assert_allclose(back.extinction, [1.5, 2.5])
        np.testing.assert_allclose(back.phase_functions[0].coefficients,
                                   0.85 ** np.arange(1, 33), rtol=1e-6)
        assert back.description == "test table"

    def test_angle_value_roundtrip(self, tmp_path):
        ang = np.linspace(0, np.pi, 181)
        tbl = PhaseFunctionTable(
            [PhaseFunction(angles=ang, values=1 + 0.5 * np.cos(ang)),
             PhaseFunction(angles=ang, values=np.ones_like(ang))],
            key=[1.0, 2.0])
        path = str(tmp_path / "av.pft")
        io_netcdf.write_phase_function_table(tbl, path)
        back = io_netcdf.read_phase_function_table_file(path)
        np.testing.assert_allclose(back.phase_functions[0].values,
                                   1 + 0.5 * np.cos(ang), rtol=1e-6)

    def test_reference_dim_typo_preserved(self, tmp_path):
        """The reference writer names the coefficient dim 'coefficents'
        (reference: src/scatteringPhaseFunctions.f95:1046); we keep it."""
        tbl = PhaseFunctionTable([PhaseFunction.henyey_greenstein(0.5, 8)],
                                 key=[1.0])
        path = str(tmp_path / "t.pft")
        io_netcdf.write_phase_function_table(tbl, path)
        with netcdf_file(path, "r", mmap=False) as nc:
            assert "coefficents" in nc.dimensions


class TestDomainIO:
    def test_step_cloud_roundtrip(self, tmp_path):
        grid, components, temps = step_cloud_scene(ssa=0.99)
        path = str(tmp_path / "step.dom")
        io_netcdf.write_domain(path, grid, components, temps=temps,
                               surface_albedo=0.3)
        g2, comps2, temps2, attrs = io_netcdf.read_domain(path)

        assert g2.shape == grid.shape
        np.testing.assert_allclose(np.asarray(g2.x_edges),
                                   np.asarray(grid.x_edges), rtol=1e-6)
        assert attrs["surface_albedo"] == pytest.approx(0.3)
        c0 = comps2[0]
        np.testing.assert_allclose(c0.extinction, components[0].extinction,
                                   rtol=1e-12)
        np.testing.assert_allclose(
            c0.single_scattering_albedo,
            components[0].single_scattering_albedo, rtol=1e-12)
        np.testing.assert_array_equal(c0.phase_function_index,
                                      components[0].phase_function_index)
        # Rebuild a transport domain from the file and check solver arrays
        d1 = build_domain(grid, components, n_cdf_steps=201)
        d2 = build_domain(g2, comps2, n_cdf_steps=201)
        np.testing.assert_allclose(np.asarray(d2.total_ext),
                                   np.asarray(d1.total_ext), rtol=1e-6)

    def test_horizontally_uniform_component(self, tmp_path):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.domain import OpticalComponent
        grid = Grid.regular(4, 4, 6, 1, 1, 0.5)
        tbl = PhaseFunctionTable([PhaseFunction.isotropic()], key=[1.0])
        comp = OpticalComponent(
            name="aerosol", extinction=np.linspace(1, 2, 4)[None, None, :],
            single_scattering_albedo=np.full((1, 1, 4), 0.7),
            phase_function_index=np.zeros((1, 1, 4), np.int32),
            phase_function_table=tbl, z_level_base=1)
        path = str(tmp_path / "hu.dom")
        io_netcdf.write_domain(path, grid, [comp])
        _, comps2, _, _ = io_netcdf.read_domain(path)
        assert comps2[0].is_horizontally_uniform
        assert comps2[0].z_level_base == 1
        np.testing.assert_allclose(comps2[0].extinction[0, 0],
                                   np.linspace(1, 2, 4), rtol=1e-12)


class TestResultsNetcdfFluxOnly:
    def test_write_without_absorption_profile(self, tmp_path):
        """The record kernel's flux_abs_2d path yields tallies with
        neither volume_absorption nor absorption_profile; the netCDF
        writer must not require them (regression: KeyError at
        results_netcdf.py nz lookup after a whole TPU run)."""
        import numpy as np
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.driver.results_netcdf import write_results_netcdf
        from mcbrat3d_tpu.driver.run import Results
        from scipy.io import netcdf_file

        nx, ny, nz = 4, 3, 5
        grid = Grid.regular(nx, ny, nz, 100.0, 100.0, 50.0)
        f = {k: np.random.RandomState(0).rand(nx, ny)
             for k in ("flux_up", "flux_down", "flux_absorbed")}
        e = {k: v * 0.01 for k, v in f.items()}
        res = Results(mean=f, stderr=e, total_photons=1000, n_batches=2,
                      solar_flux=1.0, elapsed_seconds=1.0)
        path = str(tmp_path / "fluxonly.nc")
        write_results_netcdf(path, res, grid)
        with netcdf_file(path, "r") as nc:
            assert nc.variables["fluxUp"].shape == (ny, nx)
            assert "absorptionProfile" not in nc.variables
            assert nc.dimensions["z"] == nz
