import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512; C = 1024; H = C // 128; R = 4; W = 128 // H  # W=16
BLK = 16

def gather_kernel(b_ref, e_ref, k_ref, idx_ref, out_ref):
    Bb = b_ref[:].astype(jnp.bfloat16)   # [128, 128] cols h*W+w
    E = e_ref[:].astype(jnp.bfloat16)    # [H->128 pad, 128]: E[h, h*W+w]=1
    K = k_ref[:].astype(jnp.bfloat16)    # [128, 128]: K[h*W+w, w]=1
    def body(i, _):
        idx = idx_ref[pl.ds(i * BLK, BLK), :]
        lo = idx % 128
        hi = idx // 128
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 2)
        oh = (lo[:, :, None] == iota).astype(jnp.bfloat16)
        oh2 = oh.reshape(BLK * 128, 128)
        T = jnp.dot(oh2, Bb, preferred_element_type=jnp.float32)
        ohh = (hi[:, :, None] == iota).astype(jnp.bfloat16)  # hi < H <=128
        ohh2 = ohh.reshape(BLK * 128, 128)
        ohh_rep = jnp.dot(ohh2, E, preferred_element_type=jnp.float32)
        M = (T * ohh_rep).astype(jnp.bfloat16)
        O = jnp.dot(M, K, preferred_element_type=jnp.float32)  # [2048,128]
        O3 = O.reshape(BLK, 128, 128)
        for r in range(R):
            out_ref[r, pl.ds(i * BLK, BLK), :] = O3[:, :, r]
        return 0
    jax.lax.fori_loop(0, S // BLK, body, 0)

@jax.jit
def gather(bp, E, K, idx):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((R, S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(bp, E, K, idx)

key = jax.random.key(0)
records = jax.random.uniform(key, (C, R))
rec3 = np.zeros((128, H, W)); rec3[:, :, :R] = np.asarray(records).reshape(H, 128, R).transpose(1, 0, 2)
bp = jnp.asarray(rec3.reshape(128, H * W))
E = np.zeros((128, 128))
for h in range(H):
    E[h, h*W:(h+1)*W] = 1.0
K = np.zeros((128, 128))
for h in range(H):
    for w in range(W):
        K[h*W+w, w] = 1.0
E = jnp.asarray(E); K = jnp.asarray(K)

idx = jax.random.randint(key, (S, 128), 0, C)
out = gather(bp, E, K, idx)
ref = np.asarray(records)[np.asarray(idx).reshape(-1)]
got = np.asarray(out).transpose(1, 2, 0).reshape(-1, R)
ok = np.allclose(got, ref, rtol=1e-2, atol=1e-3)
print("gather correct:", ok, "maxerr:", np.abs(got-ref).max())

ITERS = 300
@jax.jit
def loop(bp, E, K, idx0):
    def body(c):
        acc, i = c
        o = gather(bp, E, K, (idx0 + i) % C)
        return (acc + o[0], i + 1)
    return jax.lax.while_loop(lambda c: c[1] < ITERS, body, (jnp.zeros((S,128)), 0))[0]
float(jnp.sum(loop(bp, E, K, idx)))
t0 = time.time(); s = float(jnp.sum(loop(bp, E, K, idx)))
print(f"pallas gather: {(time.time()-t0)/ITERS*1e6:.1f} us/call (65k lanes, R={R})")
