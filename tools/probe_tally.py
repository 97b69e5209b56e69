"""Marginal-cost probe for the radiance LE tally and the planned
"colscan" closed-form column march (round-4 task #4).

The 64-dir radiance tally costs ~31 us/direction/step on hardware
(tools/exp_radiance.py bisection: lestatictally == production,
letallysum == noletally), i.e. the one-hot + contraction IS the cost
and the dynamic accumulator store is free. This probe times the pieces
in isolation with an in-kernel serial-dependence loop (the
probe_gather2.py method: per-iteration = wall / (REPS * INNER), data
dependence via index perturbation so Mosaic cannot hoist).

Variants:
  onehot_f32   build (BLK,128,128) f32 one-hot only
  onehot_bf16  build (BLK,128,128) bf16 one-hot only
  dotonly      2 bf16 dots [8,nb]x[nb,128] with loop-varying A, const o2
  tally_full   production tally: one-hot + ohh_j/a_h/a_l + 2 dots
  colscan      planned closed-form column-march iteration body
               (dyn row read + interval math + 4 take_alongs)

Run on the TPU host: python tools/probe_tally.py [variant|all]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLK = int(os.environ.get("PROBE_BLK", "16"))
INNER = int(os.environ.get("PROBE_INNER", "128"))
REPS = 8
NX = 32
NZP = 33


def _perturb(idx0, v, mask):
    return jnp.bitwise_and(idx0 + (v * 997.0).astype(jnp.int32), mask)


def make_onehot(dtype):
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = jnp.bitwise_and(idx_ref[:], 127)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 2)

        def body(i, carry):
            idx, acc = carry
            ohs = (idx[:, :, None] == iota).astype(dtype)
            v = ohs[:, :, 0].astype(jnp.float32) + ohs[:, :, 1].astype(
                jnp.float32)
            return _perturb(idx0, v, 127), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def make_dotonly():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = jnp.bitwise_and(idx_ref[:], 127)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 2)
        o2 = (idx0[:, :, None] == iota).astype(jnp.bfloat16).reshape(
            BLK * 128, 128)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)

        def body(i, carry):
            idx, acc = carry
            val = idx.astype(jnp.float32) * 0.013
            hi = jnp.right_shift(idx, 7)
            ohh = iota_j == hi[None, :, :]
            zero = jnp.bfloat16(0)
            a_h = jnp.where(ohh, val.astype(jnp.bfloat16)[None], zero
                            ).reshape(8, BLK * 128)
            iout = jnp.dot(a_h, o2, preferred_element_type=jnp.float32)
            iout = iout + jnp.dot(a_h, o2,
                                  preferred_element_type=jnp.float32)
            v = jnp.broadcast_to(iout[0:1, :], (BLK, 128))
            return _perturb(idx0, v, 127), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def make_tally_full():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = jnp.bitwise_and(idx_ref[:], 1023)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 2)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            hi = jnp.right_shift(idx, 7)
            val = idx.astype(jnp.float32) * 0.013
            ohs = (lo[:, :, None] == iota).astype(jnp.bfloat16)
            o2 = ohs.reshape(BLK * 128, 128)
            ohh = iota_j == hi[None, :, :]
            zero = jnp.bfloat16(0)
            vh = val.astype(jnp.bfloat16)
            vl = (val - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            a_h = jnp.where(ohh, vh[None], zero).reshape(8, BLK * 128)
            a_l = jnp.where(ohh, vl[None], zero).reshape(8, BLK * 128)
            iout = (jnp.dot(a_h, o2, preferred_element_type=jnp.float32)
                    + jnp.dot(a_l, o2,
                              preferred_element_type=jnp.float32))
            v = jnp.broadcast_to(iout[0:1, :], (BLK, 128))
            return _perturb(idx0, v, 1023), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def make_colscan():
    # Planned inner body per (column, wrap): dynamic 2-row read of the
    # column's z-profile (CT at level k and k+1 pre-shifted), closed-form
    # sigma interval -> z_in/z_out, 4 take_alongs + lerp, tau update.
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = jnp.bitwise_and(idx_ref[:], 127)
        sig0 = idx0.astype(jnp.float32) * 0.25
        g = 1.7
        zmax = 30.0

        def body(c, carry):
            idx, tau = carry
            rows = tab_ref[pl.ds(2 * jnp.bitwise_and(c, NX - 1), 2)]
            ct_k = jnp.broadcast_to(rows[0:1, :], (BLK, 128))
            ct_k1 = jnp.broadcast_to(rows[1:2, :], (BLK, 128))
            cf = c.astype(jnp.float32)
            q = jnp.ceil((sig0 - cf) * (1.0 / NX))
            j = cf + NX * q
            s_in = jnp.maximum(j, sig0)
            s_out = j + 1.0
            z_in = jnp.clip(3.0 + (s_in - sig0) * g, 0.0, zmax)
            z_out = jnp.clip(3.0 + (s_out - sig0) * g, 0.0, zmax)
            u_i = jnp.clip(z_in, 0.0, np.float32(NZP - 1))
            u_o = jnp.clip(z_out, 0.0, np.float32(NZP - 1))
            k_i = u_i.astype(jnp.int32)
            f_i = u_i - k_i.astype(jnp.float32)
            k_o = u_o.astype(jnp.int32)
            f_o = u_o - k_o.astype(jnp.float32)
            v_i = (jnp.take_along_axis(ct_k, k_i, axis=1) * (1.0 - f_i)
                   + jnp.take_along_axis(ct_k1, k_i, axis=1) * f_i)
            v_o = (jnp.take_along_axis(ct_k, k_o, axis=1) * (1.0 - f_o)
                   + jnp.take_along_axis(ct_k1, k_o, axis=1) * f_o)
            tau = tau + jnp.maximum(v_i - v_o, 0.0)
            return _perturb(idx0, tau, 127), tau

        _, acc = jax.lax.fori_loop(
            0, INNER, body,
            (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


VARIANTS = {
    "onehot_f32": (lambda: make_onehot(jnp.float32)),
    "onehot_bf16": (lambda: make_onehot(jnp.bfloat16)),
    "dotonly": make_dotonly,
    "tally_full": make_tally_full,
    "colscan": make_colscan,
}


def run(which, interpret=False):
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, 1024, (BLK, 128)), jnp.int32)
    tab = jnp.asarray(rs.rand(2 * NX, 128), jnp.float32)
    kernel = VARIANTS[which]()
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((BLK, 128), jnp.float32),
        interpret=interpret)
    f = jax.jit(lambda: call(idx, tab))
    s0 = float(jnp.sum(f()))
    best = float("inf")
    for _ in range(1 if interpret else REPS):
        t0 = time.time()
        s0 = float(jnp.sum(f()))
        best = min(best, time.time() - t0)
    print(f"{which}: checksum {s0:.3f}  {best / INNER * 1e6:.3f} us/iter "
          f"({BLK * 128} lanes, INNER={INNER})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    interpret = "--interpret" in sys.argv
    for k in (VARIANTS if which == "all" else [which]):
        run(k, interpret)


if __name__ == "__main__":
    main()
