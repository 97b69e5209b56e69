"""Scene-generator command line: `mcbrat mkdomain <scene> <out.nc> k=v ...`.

Equivalent of the reference's Domain-Files generator programs (reference:
Domain-Files/i3rcStepCloud.f95 etc.), writing reference-schema domain netCDF
files.
"""

from __future__ import annotations

from mcbrat3d_tpu.domain import io_netcdf


def _parse_params(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


SCENES = {}


def _register(name):
    def deco(fn):
        SCENES[name] = fn
        return fn
    return deco


@_register("step_cloud")
def _step_cloud(**kw):
    from mcbrat3d_tpu.scenes.step_cloud import step_cloud_scene
    return step_cloud_scene(**kw)


@_register("plane_parallel")
def _plane_parallel(**kw):
    from mcbrat3d_tpu.scenes.plane_parallel import plane_parallel_scene
    return plane_parallel_scene(**kw)


@_register("step_cloud_2tau")
def _step_cloud_2tau(**kw):
    from mcbrat3d_tpu.scenes.collection import step_cloud_2tau_scene
    return step_cloud_2tau_scene(**kw)


@_register("cubic")
def _cubic(**kw):
    from mcbrat3d_tpu.scenes.collection import cubic_cloud_scene
    return cubic_cloud_scene(**kw)


@_register("homog_bb")
def _homog_bb(**kw):
    from mcbrat3d_tpu.scenes.collection import homog_bb_scene
    return homog_bb_scene(**kw)


@_register("inhomog_bb")
def _inhomog_bb(**kw):
    from mcbrat3d_tpu.scenes.collection import inhomog_bb_scene
    return inhomog_bb_scene(**kw)


@_register("landsat")
def _landsat(**kw):
    from mcbrat3d_tpu.scenes.collection import landsat_cloud_scene
    return landsat_cloud_scene(**kw)


@_register("radar")
def _radar(**kw):
    from mcbrat3d_tpu.scenes.collection import radar_cloud_scene
    return radar_cloud_scene(**kw)


@_register("broken_cloud")
def _broken_cloud(**kw):
    from mcbrat3d_tpu.scenes.collection import broken_cloud_scene
    return broken_cloud_scene(**kw)


def main(scene: str, output: str, params=None) -> int:
    if scene not in SCENES:
        print(f"unknown scene {scene!r}; available: {sorted(SCENES)}")
        return 2
    kw = _parse_params(params)
    grid, components, temps = SCENES[scene](**kw)
    io_netcdf.write_domain(output, grid, components, temps=temps)
    print(f"wrote {output}")
    return 0
