"""Full offline-to-solver pipeline: Mie -> SSP table -> broadband transport.

Exercises the reference's complete production flow (MieSSPTableCreate ->
read_Common/read_SSPTable -> monteCarloDriver; reference: SURVEY.md section
1 data-flow pipeline) end-to-end through real files.
"""

import numpy as np
import pytest

from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.common import CommonDomain, write_common
from mcbrat3d_tpu.domain.ssp import read_ssp_table, write_ssp_table
from mcbrat3d_tpu.driver.config import SimulationConfig
from mcbrat3d_tpu.spectral import solar as solar_io
from mcbrat3d_tpu.spectral.broadband import run_broadband
from mcbrat3d_tpu.tools.ssp_create import SSPCreateConfig, create_ssp_table


@pytest.mark.slow
def test_mie_to_broadband_pipeline(tmp_path):
    lams = [0.55, 0.65]
    ssp = create_ssp_table(SSPCreateConfig(
        lambdas_um=lams, partype="W", sretab=5.0, eretab=15.0, n_reff=3,
        maxradius=35.0, surface_albedo=[0.1, 0.1], max_legendre=512))
    ssp_path = str(tmp_path / "ssp.nc")
    write_ssp_table(ssp_path, ssp)

    back = read_ssp_table(ssp_path)
    comp = back.components[0]
    assert comp.extinction.shape == (3, 2)
    assert np.all(comp.ssa > 0.999)  # visible water: conservative

    grid = Grid.regular(4, 4, 4, 0.25, 0.25, 0.05)
    common = CommonDomain(
        grid=grid, temps=np.full((4, 4, 4), 283.0),
        mass_conc=np.full((1, 4, 4, 4), 0.3),  # g/m^3
        reff=np.full((1, 4, 4, 4), 10.0))
    common_path = str(tmp_path / "common.nc")
    write_common(common_path, common)

    solar_path = str(tmp_path / "solar.nc")
    solar_io.write_solar_source(solar_path, lams, [1900.0, 1500.0])

    cfg = SimulationConfig(
        solar_mu=0.8, num_lambda=2, lw_flag=-1.0, calc_rayleigh=False,
        num_photons_per_batch=1 << 12, num_batches=4, iseed=2,
        n_phase_intervals=1001, n_lanes=1 << 10, max_steps=4000,
        phys_domain_file=common_path, ssp_file_names=[ssp_path],
        solar_source_file=solar_path)
    res = run_broadband(cfg)

    # cloud optical depth per column: beta ~ ext_tab(10um) * 0.3 g/m^3 *
    # 0.2 km; with ~160 km^-1/(g m^-3) -> tau ~ 9.6: a thick bright cloud
    total = (res.mean["mean_flux_up"] + res.mean["mean_flux_down"]
             + res.mean["mean_flux_absorbed"])
    # black-ish energy budget: up + down*(1-albedo_eff)... with albedo 0.1,
    # surface absorbs 0.9*down; just require closure of the full budget:
    sfc_absorbed = 0.9 * res.mean["mean_flux_down"]
    budget = (res.mean["mean_flux_up"] + res.mean["mean_flux_absorbed"]
              + sfc_absorbed)
    np.testing.assert_allclose(budget, res.solar_flux, rtol=0.02)
    # thick conservative cloud at mu0=0.8: most light reflects
    assert res.mean["mean_flux_up"] > 0.4 * res.solar_flux
    assert res.mean["mean_flux_absorbed"] < 0.02 * res.solar_flux
