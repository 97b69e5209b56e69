"""1-device real-TPU mesh check: shard_map x pallas_call composition.

The production multi-chip configuration is the megakernel launched
inside run_batch_sharded's shard_map. The CPU-mesh test
(tests/test_parallel.py::test_sharded_megakernel_composes) proves the
composition in interpret mode; this drives it on the REAL chip (1-device
mesh) and checks bit-identity against the serial run_batch with the
same (seed, batch) -- n_dev == 1 means identical RNG streams.

Usage (TPU host): python tools/exp_mesh1.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

    dom = make_step_cloud(ssa=0.99)
    sfc = Surface.lambertian(0.2)
    src = illumination.directional(0.5, 0.0)
    cfg = KernelConfig(n_lanes=1 << 12, photons_per_lane=4,
                       max_steps=20_000, use_pallas="on")
    mesh = make_mesh()
    print("mesh devices:", mesh.devices.size, flush=True)
    tS = run_batch_sharded(dom, sfc, src, seed=7, global_batch=0,
                           config=cfg, mesh=mesh)
    nS = int(tS.n_photons)
    t1 = run_batch(dom, sfc, src, rng.batch_key(7, 0), cfg)
    n1 = int(t1.n_photons)
    print("photons:", nS, n1, flush=True)
    same = True
    for name in ("flux_up", "flux_down", "flux_absorbed"):
        a = np.asarray(getattr(tS, name))
        b = np.asarray(getattr(t1, name))
        eq = bool((a == b).all())
        same &= eq
        print(f"{name} bitwise: {eq}", flush=True)
    R = float(jnp.sum(tS.flux_up)) / nS
    print(f"sharded megakernel on real TPU: R={R:.4f}  "
          f"bit-identical={same}", flush=True)


if __name__ == "__main__":
    main()
