"""Step-cost lever experiments toward the 1e8 step-cloud target.

Round-3's ceiling analysis (PERF_NOTES.md): 44 us/step = core 23 +
gather ~10 + tally ~11 at 65k lanes; 31.5 steps/photon is physics
(76.9% real collisions, 1.3% nulls). Reaching 1e8 photons/s (~21
us/step at that step count) needs structural cuts, not trims. This
harness measures each identified lever ON HARDWARE, one process,
sequential configs, min-of-2 reps with verified step counts
(the round-2 measurement discipline), and prints a markdown table for
EXPERIMENTS_1e8.md.

Levers measured:
  * baseline (round-3 production config, volume tally on)
  * flux_abs_2d (per-column absorbed tally, no [nxyz] volume rows)
  * macro_factor sweep (fewer face clips vs more nulls: 18.6% of steps
    were macro-face clips at mf=8)

Usage (on the TPU host):  python tools/exp_step_cost.py [--quick]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def measure_config(domain, config, n_reps=2):
    """Photons/sec, honest host-fetch timing, min over reps."""
    from mcbrat3d_tpu.core import rng
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import run_batch

    surface = Surface.lambertian(0.0)
    source = illumination.directional(0.5, 0.0)

    def once(b):
        t = run_batch(domain, surface, source, rng.batch_key(0, b),
                      config)
        return int(t.n_photons)  # host fetch forces sync

    n0 = once(0)  # compile + warm
    best = 0.0
    for rep in range(n_reps):
        t0 = time.time()
        n = once(rep + 1)
        dt = time.time() - t0
        best = max(best, n / dt)
    return best, n0


def main():
    quick = "--quick" in sys.argv
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.transport.integrator import KernelConfig

    ppl = 128 if quick else 1024
    rows = []

    def run(name, mf, **kw):
        domain = make_step_cloud(ssa=0.99, macro_factor=mf)
        cfg = KernelConfig(n_lanes=1 << 16, photons_per_lane=ppl,
                           max_steps=1_600_000, use_pallas="on", **kw)
        rate, _ = measure_config(domain, cfg)
        rows.append((name, rate))
        print(f"| {name} | {rate / 1e6:.1f} |", flush=True)

    print("| lever | Mphotons/s |", flush=True)
    print("|---|---|", flush=True)
    # round-4 final state (EXPERIMENTS_1e8.md): dyn gather auto-engages;
    # headline config = reference-default outputs, mf=16
    run("HEADLINE dyn mf=16 flux2d", 16, need_volume_absorption=False)
    run("dyn mf=16 (vol tally)", 16)
    run("dyn mf=8 flux2d", 8, need_volume_absorption=False)
    best = max(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} at {best[1] / 1e6:.1f} M photons/s "
          f"(target 100.0)", flush=True)


if __name__ == "__main__":
    main()
