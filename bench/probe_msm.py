"""On-chip probes for the MSM hot-path redesign (round 2).

Measures, with the chained-iteration methodology from PERF_NOTES.md
(data-dependent fori_loop inside one jit, so the serving stack cannot
dedupe dispatches and the per-dispatch floor amortizes):

  1. XLA row-gather throughput vs row width (the wave phase's gather cost)
  2. argsort + searchsorted cost at MSM shapes
  3. fused (K,N) mont_mul rate (sanity vs the 127 M muls/s record)

Run on the real chip:  python bench/probe_msm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, variants, iters=3):
    """variants: list of arg-tuples, one per call — the serving stack dedupes
    repeated IDENTICAL dispatches, so every timed call needs fresh inputs."""
    import jax

    def sync(o):
        import jax.numpy as jnp
        # block_until_ready is unreliable through the axon tunnel; a host
        # transfer of a full reduction is a real barrier
        return np.asarray(jax.tree.map(lambda a: jnp.sum(a), o))

    sync(fn(*variants[-1]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        sync(fn(*variants[i]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log_n = int(os.environ.get("PROBE_LOG_N", "20"))
    n = 1 << log_n
    R = 16  # chained reps inside one jit

    rng = np.random.default_rng(3)

    def vary(arr, k=3):
        """k variants of an int32 device array differing in one element."""
        out = []
        for i in range(k):
            a = np.asarray(arr).copy()
            a.flat[0] = (a.flat[0] + i + 1) % max(2, int(a.max()) or 2)
            out.append(jnp.asarray(a))
        return out

    # ---- 1. gather: (n, C) int32 table, n random row indices, chained ----
    for C in (8, 16, 32):
        table = jnp.asarray(
            rng.integers(0, 1 << 16, size=(n, C), dtype=np.int32))
        idx0 = rng.integers(0, n, size=(n,), dtype=np.int32)

        @jax.jit
        def chain_gather(table, idx0):
            def body(_, carry):
                idx, acc = carry
                g = table[idx]
                acc = acc + g[:, 0]
                # data-dependent next indices (cheap, keeps the chain honest)
                idx = (idx + g[:, 0]) & (n - 1)
                return idx, acc
            idx, acc = jax.lax.fori_loop(0, R, body, (idx0, jnp.zeros(n, jnp.int32)))
            return acc

        t = timed(chain_gather, [(table, jnp.asarray(v)) for v in
                                 (idx0, idx0 + 1, idx0 + 2, idx0 + 3)]) / R
        rate = n / t
        print(f"gather rows C={C:3d} ({C*4:4d}B): {t*1e3:8.2f} ms "
              f"-> {rate/1e6:7.1f} M rows/s, {rate*C*4/1e9:7.2f} GB/s")

    # ---- 2. sort shapes -------------------------------------------------
    W = 17
    keys = rng.integers(0, 1 << 15, size=(W, n), dtype=np.int32)

    @jax.jit
    def one_argsort(keys):
        return jnp.argsort(keys, axis=1)[:, 0]

    t = timed(one_argsort, [(jnp.asarray(keys + i),) for i in range(4)])
    print(f"argsort (W={W}, n=2^{log_n}): {t*1e3:8.2f} ms")

    @jax.jit
    def one_sortpair(keys):
        payload = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
        k, v = jax.lax.sort((keys, payload), dimension=1, num_keys=1)
        return v[:, 0]

    t = timed(one_sortpair, [(jnp.asarray(keys + i),) for i in range(4)])
    print(f"sort-pair one-shot (W={W}, n=2^{log_n}): {t*1e3:8.2f} ms")

    # ---- 3. fused mont_mul rate sanity ---------------------------------
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.ops.field import LimbField
    from gnark_icicle_tpu.ops.field_t import TField

    F = LimbField(bn254.P)
    tf = TField(F)
    K = F.K
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(K, n), dtype=np.int32))
    x = x.at[K - 1].set(x[K - 1] & 0xFF)  # keep < p
    y = jnp.asarray(rng.integers(0, 1 << 16, size=(K, n), dtype=np.int32))
    y = y.at[K - 1].set(y[K - 1] & 0xFF)

    @jax.jit
    def chain_mul(x, y):
        def body(_, v):
            return tf.mont_mul(v, y)
        return jax.lax.fori_loop(0, R, body, x)

    xs = [(x.at[0, i].set(i + 1), y) for i in range(4)]
    t = timed(chain_mul, xs) / R
    print(f"fused mont_mul (K={K}, n=2^{log_n}): {t*1e3:8.2f} ms "
          f"-> {n/t/1e6:7.1f} M muls/s")


if __name__ == "__main__":
    main()
