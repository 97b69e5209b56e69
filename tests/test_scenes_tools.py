"""Scene generators and the physical-properties converter."""

import numpy as np
import pytest

from mcbrat3d_tpu.domain.domain import build_domain
from mcbrat3d_tpu.physics.phase_function import PhaseFunction, PhaseFunctionTable
from mcbrat3d_tpu.scenes import collection as sc
from mcbrat3d_tpu.tools import physical_to_domain as p2d


class TestScenes:
    def test_step_cloud_2tau(self):
        grid, comps, temps = sc.step_cloud_2tau_scene()
        assert grid.shape == (1000, 1, 50)
        ext = comps[0].extinction
        np.testing.assert_allclose(ext[0, 0, 0] * 500.0, 0.2, rtol=1e-6)
        np.testing.assert_allclose(ext[-1, 0, 0] * 500.0, 3.0, rtol=1e-6)

    def test_cubic(self):
        grid, comps, _ = sc.cubic_cloud_scene(tau=8.0, nx=16, ny=16, nz=16)
        ext = comps[0].extinction
        assert ext[8, 8, 8] > 0
        assert ext[0, 0, 0] == 0
        # vertical tau through the cube center
        tau = np.sum(ext[8, 8, :]) * (1000.0 / 16)
        np.testing.assert_allclose(tau, 8.0, rtol=1e-6)

    def test_homog_bb(self):
        grid, comps, temps = sc.homog_bb_scene(beta_ext=5.0, iso_temp=280.0)
        assert np.all(temps == 280.0)
        d = build_domain(grid, comps, n_cdf_steps=101, temps=temps)
        assert float(d.max_extinction) == pytest.approx(5.0)

    @pytest.mark.parametrize("pattern", ["gaussian", "step", "checker"])
    def test_inhomog_bb(self, pattern):
        grid, comps, temps = sc.inhomog_bb_scene(pattern=pattern, nx=8, ny=8,
                                                 nz=4)
        ext = comps[0].extinction
        assert ext.min() >= 0.1 - 1e-9 and ext.max() <= 30.0 + 1e-9
        assert ext.std() > 0  # actually inhomogeneous
        assert temps[0, 0, 0] > temps[0, 0, -1]  # lapse rate

    def test_landsat_reader(self, tmp_path):
        nx, ny = 8, 4
        rs = np.random.RandomState(0)
        tau = np.round(rs.rand(ny, nx) * 20, 2)
        thick = np.round(0.2 + rs.rand(ny, nx), 2)  # km
        tau_f = tmp_path / "tau.txt"
        dz_f = tmp_path / "dz.txt"
        np.savetxt(tau_f, tau, fmt="%7.2f")
        np.savetxt(dz_f, thick, fmt="%7.2f")
        grid, comps, _ = sc.landsat_cloud_scene(str(tau_f), str(dz_f),
                                                nx=nx, ny=ny, delta_z=100.0)
        ext = comps[0].extinction
        # column optical depth preserved exactly
        col_tau = ext.sum(axis=2) * 100.0
        np.testing.assert_allclose(col_tau, tau.T, rtol=1e-6)

    def test_hg_dump(self):
        out = sc.hg_phase_values(0.85, 19)
        assert out.shape == (19, 2)
        assert out[0, 1] > out[-1, 1]  # forward peak


class TestPhysicalToDomain:
    def _table(self):
        return PhaseFunctionTable(
            [PhaseFunction.henyey_greenstein(0.8, 16),
             PhaseFunction.henyey_greenstein(0.85, 16)],
            key=[5.0, 15.0], extinction=[300.0, 100.0],
            single_scattering_albedo=[0.999, 0.995])

    def _write_type2(self, path):
        lines = ["2", "2 1 2", "0.5 0.5",
                 "0.0 0.25 0.5",  # z levels
                 "290.0 285.0 280.0"]  # temps
        lines.append("1 1 1 0.3 10.0")
        lines.append("2 1 2 0.5 12.5")
        path.write_text("\n".join(lines) + "\n")

    def test_type2_roundtrip(self, tmp_path):
        f = tmp_path / "particles.txt"
        self._write_type2(f)
        pf = p2d.read_particle_file(str(f))
        assert pf.file_type == 2 and pf.nx == 2 and pf.nz == 2
        np.testing.assert_allclose(pf.mass[0][0, 0, 0], 0.3)
        np.testing.assert_allclose(pf.reff[0][1, 0, 1], 12.5)

        grid, comps, temps = p2d.particles_to_components(pf, [self._table()])
        c = comps[0]
        # reff=10 midway between keys: ext = 0.3 * 200
        np.testing.assert_allclose(c.extinction[0, 0, 0], 0.3 * 200.0,
                                   rtol=1e-6)
        # reff=12.5 -> f=0.75: ext = 0.5*(0.25*300+0.75*100) = 75
        np.testing.assert_allclose(c.extinction[1, 0, 1], 75.0, rtol=1e-6)
        assert c.phase_function_index[1, 0, 1] == 1  # nearest = entry 2
        np.testing.assert_allclose(temps[0, 0, 0], 287.5)

    def test_type1_reff_from_lwc(self, tmp_path):
        f = tmp_path / "p1.txt"
        f.write_text("1\n1 1 1\n1.0 1.0\n0.0 0.5\n290. 285.\n1 1 1 0.3\n")
        pf = p2d.read_particle_file(str(f), drop_num_conc=100.0)
        expect = 100.0 * (0.3 * 0.75 * 1.3889 / (np.pi * 100.0)) ** (1 / 3)
        np.testing.assert_allclose(pf.reff[0][0, 0, 0], expect, rtol=1e-6)

    def test_type3_multicomponent(self, tmp_path):
        f = tmp_path / "p3.txt"
        f.write_text("3\n1 1 1\n1.0 1.0\n0.0 0.5\n290. 285.\n"
                     "1 1 1 2  1 0.2 8.0  2 0.1 12.0\n")
        pf = p2d.read_particle_file(str(f))
        assert len(pf.mass) == 2
        assert pf.table_index == [0, 1]

    def test_type4_and_rayleigh(self, tmp_path):
        f = tmp_path / "p4.txt"
        f.write_text("4\n2 2 3\n1.0 1.0\n0.0 1.0 2.0 3.0\n"
                     "288. 281.5 275. 268.5\n")
        pf = p2d.read_particle_file(str(f))
        grid, comps, temps = p2d.particles_to_components(
            pf, [], rayleigh_wavelen=0.55)
        assert len(comps) == 1
        rayl = comps[0].extinction[0, 0]
        assert np.all(rayl > 0)
        assert rayl[0] > rayl[-1]  # decays with height
        # magnitude: ~0.012-0.014 km^-1 at 0.55um near the surface
        assert 0.008 < rayl[0] < 0.02

    def test_full_convert_writes_domain(self, tmp_path):
        from mcbrat3d_tpu.domain.io_netcdf import (
            read_domain,
            write_phase_function_table,
        )
        pfile = tmp_path / "particles.txt"
        self._write_type2(pfile)
        tfile = tmp_path / "table.pft"
        write_phase_function_table(self._table(), str(tfile))
        out = tmp_path / "out.dom"
        p2d.convert(str(pfile), [str(tfile)], str(out),
                    rayleigh_wavelen=0.65)
        grid, comps, temps, attrs = read_domain(str(out))
        assert len(comps) == 2  # particles + Rayleigh
        assert comps[1].is_horizontally_uniform
        d = build_domain(grid, comps, n_cdf_steps=101)
        assert float(d.max_extinction) > 0

    def test_molecular_absorption_profile(self, tmp_path):
        z, ext = p2d.read_molecular_absorption(
            self._write_molec(tmp_path / "gas.txt"))
        np.testing.assert_allclose(ext, [0.01, 0.02])

    def _write_molec(self, path):
        path.write_text("2\n0.0 0.25 0.5\n0.01 0.02\n")
        return str(path)


class TestOpticalToDomain:
    def test_shdom_roundtrip(self, tmp_path):
        from mcbrat3d_tpu.tools import optical_to_domain as o2d
        # 2x1x2 grid, 2 phase functions (HG g=0.5 via SHDOM chi=(2l+1)g^l)
        chi = " ".join(f"{(2*l+1)*0.5**l:.6f}" for l in range(1, 5))
        f = tmp_path / "shdom.txt"
        f.write_text(
            "T\n2 1 2\n0.5 0.5 0.0 0.25 0.5\n2\n"
            f"4 {chi}\n1 0.0\n"
            "1 1 1 290. 10.0 0.99 1\n"
            "2 1 1 290. 5.0 0.95 2\n"
            "1 1 2 285. 2.0 1.0 1\n"
            "2 1 2 285. 0.0 0.0 1\n")
        grid, comp, temps = o2d.read_shdom_optical_file(str(f))
        assert grid.shape == (2, 1, 2)
        np.testing.assert_allclose(comp.extinction[0, 0, 0], 10.0)
        np.testing.assert_allclose(comp.single_scattering_albedo[1, 0, 0], 0.95)
        assert comp.phase_function_index[1, 0, 0] == 1
        np.testing.assert_allclose(temps[0, 0, 1], 285.0)
        # SHDOM chi -> framework c_l conversion
        np.testing.assert_allclose(
            comp.phase_function_table.phase_functions[0].coefficients,
            0.5 ** np.arange(1, 5), rtol=1e-5)
        # full convert writes a loadable domain
        out = tmp_path / "o.dom"
        o2d.convert(str(f), str(out), surface_albedo=0.1)
        from mcbrat3d_tpu.domain.io_netcdf import read_domain
        g2, comps2, t2, attrs = read_domain(str(out))
        assert attrs["surface_albedo"] == pytest.approx(0.1)
        d = build_domain(g2, comps2, n_cdf_steps=101)
        assert float(d.max_extinction) == pytest.approx(10.0)


class TestMolecScattTrans:
    """Rayleigh transmission tool (reference: Tools/molecScattTrans.f95)."""

    def _common(self, tmp_path):
        from mcbrat3d_tpu.core.grid import Grid
        from mcbrat3d_tpu.domain.common import (CommonDomain,
                                                num_conc_from_pressure,
                                                write_common)
        nz = 6
        grid = Grid.regular(1, 1, nz, 500.0, 500.0, 1000.0)
        temps = np.linspace(288.0, 250.0, nz).reshape(1, 1, nz)
        pressure = np.linspace(1000.0, 500.0, nz)
        common = CommonDomain(
            grid=grid, temps=temps,
            num_conc=num_conc_from_pressure(
                pressure.reshape(1, 1, nz), temps))
        path = str(tmp_path / "common.nc")
        write_common(path, common, pressure_hpa=pressure)
        return common, path

    def test_transmission_spectrum(self, tmp_path):
        from mcbrat3d_tpu.tools.molec_scatt_trans import (
            rayleigh_transmission)

        common, _ = self._common(tmp_path)
        lam = np.array([0.3, 0.5, 0.8])
        rows = rayleigh_transmission(common, lam)
        assert rows.shape == (3, 5)
        trans = rows[:, 4]
        assert np.all((trans > 0.0) & (trans < 1.0))
        # lambda^-4: shorter wavelengths scatter more -> lower transmission
        assert trans[0] < trans[1] < trans[2]
        # surface-layer extinction column matches the physics module
        from mcbrat3d_tpu.physics.rayleigh import rayleigh_extinction
        m_air = 28.9647e-3 / 6.02214129e23
        n0 = common.num_conc[0, 0, 0]
        ext0 = rayleigh_extinction(0.5, n0 * m_air, n0)
        assert rows[1, 2] == pytest.approx(float(ext0), rel=1e-12)
        assert np.all(rows[:, 3] == 1.0)  # Rayleigh SSA

    def test_cli_writes_file(self, tmp_path):
        from mcbrat3d_tpu.driver.cli import main as cli_main

        _, path = self._common(tmp_path)
        out = str(tmp_path / "RayleighTrans.txt")
        rc = cli_main(["rayleightrans", path, "-o", out, "--n-lambda", "5"])
        assert rc == 0
        data = np.loadtxt(out)
        assert data.shape == (5, 5)
        assert data[0, 0] == pytest.approx(0.201)
        assert data[-1, 0] == pytest.approx(1.2)


def test_broken_cloud_scene_roundtrip(tmp_path):
    """broken_cloud CLI scene -> domain netCDF -> build_domain keeps the
    column-template structure (so the namelist driver path reaches the
    big-domain column megakernel on TPU)."""
    from mcbrat3d_tpu.domain import io_netcdf
    from mcbrat3d_tpu.tools import scene_cli

    out = str(tmp_path / "bc.dom")
    rc = scene_cli.main("broken_cloud", out, ["nx=16", "ny=16", "nz=8"])
    assert rc == 0
    grid, comps, temps, lam = io_netcdf.read_domain(out)
    dom = build_domain(grid, comps, macro_factor=4, n_cdf_steps=101)
    assert dom.col_template
    assert dom.macro_table is not None
