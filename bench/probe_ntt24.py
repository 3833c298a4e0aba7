"""Probe: where exactly does the 2^24 NTT exhaust HBM?

Runs the transform at increasing sizes, printing jax's device memory
profile on failure. Run ALONE on the chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.device import DeviceCtx

    ctx = DeviceCtx(bn254.BN254)
    for log_n in (23, 24):
        n = 1 << log_n
        dom = ctx.domain(log_n)
        rng = np.random.default_rng(3)
        limbs = rng.integers(0, 1 << 14, size=(n, ctx.fr_dev.K),
                             dtype=np.int32)
        try:
            x = ctx.fr_mont(limbs)
            del limbs
            res = dom.ntt_nat_to_rev(x)
            jax.block_until_ready(res)
            print(f"2^{log_n}: OK", flush=True)
            del res
        except Exception as e:
            print(f"2^{log_n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            try:
                prof = jax.profiler.device_memory_profile()
                open(f"bench/.ntt{log_n}_mem.pprof", "wb").write(prof)
                print(f"memory profile written ({len(prof)} bytes)",
                      flush=True)
            except Exception as e2:
                print(f"no memory profile: {e2}", flush=True)
            break


if __name__ == "__main__":
    main()
