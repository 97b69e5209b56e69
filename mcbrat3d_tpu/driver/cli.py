"""Command-line driver.

Equivalent of the reference's monteCarloDriver program surface: reads the
five namelist groups from the file given on the command line and runs the
simulation (reference: Drivers/monteCarloDriver.f95:103-121,230-238;
userInterface_Unix.f95:68-78). Subcommands extend the offline tool suite
(Mie tables, domain generators) as the reference's Tools/ executables do.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_run(args) -> int:
    from mcbrat3d_tpu.driver.config import load_config
    from mcbrat3d_tpu.driver.simulate import simulate_from_config

    cfg = load_config(args.namelist)
    results, written = simulate_from_config(cfg)
    print(json.dumps({
        "total_photons": results.total_photons,
        "n_batches": results.n_batches,
        "mean_flux_up": float(results.mean["mean_flux_up"]),
        "mean_flux_down": float(results.mean["mean_flux_down"]),
        "mean_flux_absorbed": float(results.mean["mean_flux_absorbed"]),
        "elapsed_seconds": round(results.elapsed_seconds, 3),
        "outputs": written,
    }))
    return 0


def _cmd_mkdomain(args) -> int:
    from mcbrat3d_tpu.tools import scene_cli
    return scene_cli.main(args.scene, args.output, args.params)


def _cmd_mie(args) -> int:
    from mcbrat3d_tpu.tools import mie_table
    return mie_table.main(args.namelist)


def _cmd_mkssp(args) -> int:
    from mcbrat3d_tpu.tools import ssp_create
    return ssp_create.main(args.namelist)


def _cmd_rayleightrans(args) -> int:
    from mcbrat3d_tpu.tools import molec_scatt_trans
    molec_scatt_trans.main(args.common_domain, args.output,
                           lambda_start_um=args.lambda_start,
                           lambda_stop_um=args.lambda_stop,
                           n_lambda=args.n_lambda)
    print(f"wrote {args.output}")
    return 0


def _cmd_optprops(args) -> int:
    from mcbrat3d_tpu.tools import optical_to_domain
    optical_to_domain.convert(args.input, args.output,
                              surface_albedo=args.surface_albedo)
    print(f"wrote {args.output}")
    return 0


def _cmd_physprops(args) -> int:
    from mcbrat3d_tpu.driver.config import parse_namelist
    from mcbrat3d_tpu.tools import physical_to_domain

    with open(args.namelist) as f:
        groups = parse_namelist(f.read())
    nml = {}
    for g in groups.values():
        nml.update(g)
    scat = nml.get("scattablefiles", [])
    if isinstance(scat, dict):
        scat = [scat[k] for k in sorted(scat)]
    if isinstance(scat, str):
        scat = [scat]
    physical_to_domain.convert(
        particle_file=nml["particlefilename"],
        scat_table_files=scat,
        output_file=nml.get("outputfilename", "domain.dom"),
        molec_abs_file=nml.get("molecabsfilename", ""),
        rayleigh_wavelen=nml.get("rayleighwavelength", 0.0),
        drop_num_conc=nml.get("dropnumconc", 100.0),
    )
    print(f"wrote {nml.get('outputfilename', 'domain.dom')}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="mcbrat",
        description="TPU-native broadband Monte Carlo radiative transfer")
    sub = ap.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run a simulation from a namelist file")
    p_run.add_argument("namelist")
    p_run.set_defaults(fn=_cmd_run)

    p_dom = sub.add_parser("mkdomain", help="generate a scene domain file")
    p_dom.add_argument("scene", help="step_cloud | plane_parallel | ...")
    p_dom.add_argument("output")
    p_dom.add_argument("params", nargs="*", help="key=value overrides")
    p_dom.set_defaults(fn=_cmd_mkdomain)

    p_mie = sub.add_parser("mie", help="build a Mie phase-function table")
    p_mie.add_argument("namelist")
    p_mie.set_defaults(fn=_cmd_mie)

    p_ssp = sub.add_parser("mkssp",
                           help="build a multi-wavelength SSP table")
    p_ssp.add_argument("namelist")
    p_ssp.set_defaults(fn=_cmd_mkssp)

    p_pp = sub.add_parser(
        "physprops",
        help="convert ASCII physical particle properties to a domain file")
    p_pp.add_argument("namelist")
    p_pp.set_defaults(fn=_cmd_physprops)

    p_mst = sub.add_parser(
        "rayleightrans",
        help="Rayleigh transmission spectrum from a common domain "
             "(molecScattTrans equivalent)")
    p_mst.add_argument("common_domain")
    p_mst.add_argument("-o", "--output", default="RayleighTrans.txt")
    p_mst.add_argument("--lambda-start", type=float, default=0.201)
    p_mst.add_argument("--lambda-stop", type=float, default=1.2)
    p_mst.add_argument("--n-lambda", type=int, default=1000)
    p_mst.set_defaults(fn=_cmd_rayleightrans)

    p_od = sub.add_parser(
        "optprops",
        help="convert SHDOM-style ASCII optical properties to a domain file")
    p_od.add_argument("input")
    p_od.add_argument("output")
    p_od.add_argument("--surface-albedo", type=float, default=0.0)
    p_od.set_defaults(fn=lambda a: _cmd_optprops(a))

    p_an = sub.add_parser(
        "analyze",
        help="summarize results netCDF files (analysis-deck equivalent)")
    p_an.add_argument("files", nargs="+")

    def _cmd_analyze(a):
        from mcbrat3d_tpu.tools.analyze_results import summarize
        for f in a.files:
            print(summarize(f))
        return 0

    p_an.set_defaults(fn=_cmd_analyze)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
