"""Decompose transposed-wave step cost at 2^20/c=16 shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gnark_icicle_tpu.ops.field import LimbField
from gnark_icicle_tpu.ops.ec_t import TCurve
from gnark_icicle_tpu.curves import bn254

F = LimbField(bn254.P)
K = F.K
N = 1 << 20
S = 557056
STEPS = 10

tc = TCurve(F, 9)
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.integers(0, 1 << 16, (N, 2 * K), dtype=np.int32))
packed_t = jnp.asarray(np.ascontiguousarray(np.asarray(packed).T))  # (2K, N)
idx0 = jnp.asarray(rng.integers(0, N, (S,), dtype=np.int32))
acc0 = tc.identity(S)
mask = jnp.ones((S,), bool)
sgn = jnp.zeros((S,), jnp.int32)
jax.block_until_ready((packed, packed_t, idx0, acc0))

def run(fn, label):
    f = jax.jit(fn)
    jax.block_until_ready(f(acc0, idx0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(acc0, idx0))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/STEPS*1e3:.2f} ms/step")

def full(acc, idx):
    def body(i, st):
        acc, idx = st
        pt_idx = (idx + i) % N
        g = packed[pt_idx]
        gt = jnp.transpose(g, (1, 0))
        q = (gt[:K], gt[K:2 * K])
        acc = tc.add_mixed_masked(acc, q, mask, sgn)
        return acc, idx
    return jax.lax.fori_loop(0, STEPS, body, (acc, idx))
run(full, "full step (gather+transpose+add)")

def no_gather(acc, idx):
    def body(i, st):
        acc, idx = st
        start = (idx[0] + i) % (N - S)
        g = jax.lax.dynamic_slice(packed, (start.astype(jnp.int32) * 0, 0), (S, 2 * K))
        gt = jnp.transpose(g, (1, 0))
        q = (gt[:K], gt[K:2 * K])
        acc = tc.add_mixed_masked(acc, q, mask, sgn)
        return acc, idx
    return jax.lax.fori_loop(0, STEPS, body, (acc, idx))
run(no_gather, "slice+transpose+add (no gather)")

def no_gather_no_t(acc, idx):
    def body(i, st):
        acc, idx = st
        gt = jax.lax.dynamic_slice(packed_t, (0, 0), (2 * K, S))
        q = (gt[:K] + (i % 2), gt[K:2 * K])
        acc = tc.add_mixed_masked(acc, q, mask, sgn)
        return acc, idx
    return jax.lax.fori_loop(0, STEPS, body, (acc, idx))
run(no_gather_no_t, "add only (pre-transposed slice)")

def add_nosign(acc, idx):
    def body(i, st):
        acc, idx = st
        gt = jax.lax.dynamic_slice(packed_t, (0, 0), (2 * K, S))
        q = (gt[:K] + (i % 2), gt[K:2 * K])
        acc = tc.add_mixed_masked(acc, q, mask, None)
        return acc, idx
    return jax.lax.fori_loop(0, STEPS, body, (acc, idx))
run(add_nosign, "add only, no sign-negate")
