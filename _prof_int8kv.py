import time
import jax, jax.numpy as jnp
import numpy as np
from simplellminference_tpu.ops.attention.paged_decode import paged_flash_decode
from simplellminference_tpu.memory import paged_kv as pkv

B, N, KVN, D, PS = 8, 32, 32, 128, 128
MP = 4
P = B * MP + 1
L = 2
rng = np.random.default_rng(0)

import functools
@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def mk(shape, dtype=jnp.bfloat16):
    a = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    return ((((a * 37 + b * 101 + 13) % 255) - 127) / 64.0).astype(dtype)

q = mk((B, N, D))
tables = jnp.asarray((rng.permutation(P - 1)[:B * MP] + 1).reshape(B, MP),
                     jnp.int32)
kv_lens = jnp.full((B,), 448, jnp.int32)

def timeit(f, *a, t=128, **kw):
    r = f(*a, **kw); np.asarray(jax.tree.leaves(r)[0][0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(t):
        r = f(*a, **kw)
    np.asarray(jax.tree.leaves(r)[0][0]).ravel()[0]
    return (time.perf_counter() - t0) / t

kpool = mk((L, P, KVN, PS, D))
vpool = mk((L, P, KVN, PS, D))
li = jnp.asarray(1, jnp.int32)

@jax.jit
def dec_bf16(q):
    return paged_flash_decode(q, kpool, vpool, tables, kv_lens, layer=li)

kq = mk((L, P, KVN, PS, D), jnp.int8)
vq = mk((L, P, KVN, PS, D), jnp.int8)
ks = jnp.full((L, P, KVN, PS), 0.01, jnp.float32)
vs = jnp.full((L, P, KVN, PS), 0.01, jnp.float32)

@jax.jit
def dec_int8(q):
    return paged_flash_decode(q, kq, vq, tables, kv_lens, layer=li,
                              k_scale=ks, v_scale=vs)

t_bf = timeit(dec_bf16, q)
t_i8 = timeit(dec_int8, q)
# bytes: bf16 = 2*kv_len*KVN*D*2*B ; int8 = half + scales
bts_bf = 2 * 448 * KVN * D * 2 * B
bts_i8 = 2 * 448 * KVN * D * 1 * B + 2 * 448 * KVN * 4 * B
print(f"paged_flash_decode: bf16 {t_bf*1e6:.0f} us ({bts_bf/t_bf/1e9:.0f} GB/s)"
      f"  int8 {t_i8*1e6:.0f} us ({bts_i8/t_i8/1e9:.0f} GB/s)")

k1 = mk((B, KVN, D))
v1 = mk((B, KVN, D))
pos = jnp.full((B,), 447, jnp.int32)

@jax.jit
def wr_bf16(kp, vp):
    return pkv.write_decode_stacked(kp, vp, k1, v1, tables, pos, li,
                                    None, None)

@jax.jit
def wr_int8(kp, vp, ksp, vsp):
    return pkv.write_decode_stacked(kp, vp, k1, v1, tables, pos, li,
                                    ksp, vsp)

t_wbf = timeit(wr_bf16, kpool, vpool, t=32)
t_wi8 = timeit(wr_int8, kq, vq, ks, vs, t=32)
print(f"write_decode (undonated, incl pool copy): bf16 {t_wbf*1e6:.0f} us"
      f"  int8 {t_wi8*1e6:.0f} us")
