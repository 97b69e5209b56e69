"""Tiled-dense design experiments (round-5 continuation).

Two measurements that price the sorted-cohort tiled design for dense
non-template 3D domains (EXPERIMENTS_1e8.md "Round 5: the dense
non-template 3D floor", consequence 2):

  (A) dyn-gather row-scaling frontier: the production record kernel's
      take_along+select chain is linear in table rows; the MEASURED
      per-row marginal on the real transport (not a standalone probe)
      decides the largest per-tile cell count that keeps a >= 5 M/s
      perfect-occupancy ceiling at the 128x128x64 target scene's 246
      lane-steps/photon. Dense tiles at 1024/2048/4096/8192 cells with
      _DYN_GATHER_MAX_OPS raised so the select chain stays engaged.

  (B) per-pass bookkeeping cost: lax.sort of (tile_key, lane) pairs +
      take of the [N, 12] f32 photon state at N = 1M/2M -- the price of
      re-cohorting between tile passes.

Run: timeout 580 python tools/exp_tile1.py [--a-only|--b-only]
"""

import os
import sys
import time

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root (mcbrat3d_tpu)
sys.path.insert(0, _here)
from exp_dense3d import dense_domain, measure  # noqa: E402


def part_a():
    import mcbrat3d_tpu.transport.pallas_kernel as pk
    pk._DYN_GATHER_MAX_OPS = 2048  # keep the select chain engaged
    # dense scene fields: ext + macro-majorant = 2 gather fields
    for (nx, ny, nz), ppl in [((8, 8, 16), 256), ((16, 8, 16), 256),
                              ((16, 16, 16), 128), ((16, 16, 32), 128),
                              ((32, 16, 32), 64)]:
        cells = nx * ny * nz
        rows = -(-cells // 128)
        measure(dense_domain(nx, ny, nz), 1 << 16, ppl,
                f"dyn dense {nx}x{ny}x{nz} ({cells} cells, {rows} rows)",
                "on")


def part_b():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sort_pairs(keys, lane):
        return jax.lax.sort((keys, lane), num_keys=1)

    @jax.jit
    def take_state(state, perm):
        return jnp.take(state, perm, axis=0)

    @jax.jit
    def full_pass(keys, lane, state):
        ks, perm = jax.lax.sort((keys, lane), num_keys=1)
        return ks, jnp.take(state, perm, axis=0)

    @jax.jit
    def offsets(ks, n_tiles=257):
        # per-tile segment starts in the sorted order (for block packing)
        return jnp.searchsorted(ks, jnp.arange(n_tiles))

    rs = np.random.RandomState(0)
    for n in (1 << 20, 1 << 21):
        keys = jnp.asarray(rs.randint(0, 256, n, np.int32))
        lane = jnp.arange(n, dtype=jnp.int32)
        state = jnp.asarray(rs.rand(n, 12).astype(np.float32))
        ks, perm = sort_pairs(keys, lane)
        st = take_state(state, perm)
        o = offsets(ks)
        jax.block_until_ready((ks, perm, st, o))
        for name, fn, args in [
                ("sort_pairs", sort_pairs, (keys, lane)),
                ("take_state[N,12]", take_state, (state, perm)),
                ("full_pass", full_pass, (keys, lane, state)),
                ("offsets", offsets, (ks,))]:
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(fn(*args))
                best = min(best, time.time() - t0)
            print(f"N={n}: {name:18s} {best * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    import jax
    print("init", jax.devices(), flush=True)
    if "--b-only" not in sys.argv:
        part_a()
    if "--a-only" not in sys.argv:
        part_b()
