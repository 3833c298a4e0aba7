"""On-device bit-exactness check: fused RCB16 mixed-add kernel vs the
composed per-mul path, then (if exact) a staged-MSM A/B can follow.

Run alone on the chip:  python bench/check_fused_add.py
"""

import json
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

    import random

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.ops.ec_t import TCurve, TCurve2
    from gnark_icicle_tpu.ops.field import LimbField

    F = LimbField(bn254.P)
    M = 4096
    rng = random.Random(11)
    nprng = np.random.default_rng(3)
    mask = jnp.asarray(nprng.integers(0, 2, size=M).astype(bool))
    sign = jnp.asarray(nprng.integers(0, 2, size=M).astype(np.int32))

    def enc_t(vals):
        return jnp.asarray(
            np.stack([np.asarray(F.encode([v]))[0] for v in vals]).T
        ).astype(jnp.int32)

    if "--g2" in sys.argv:
        tc2 = TCurve2(F, -1, (3 * bn254.G2_B.c0 % bn254.P,
                              3 * bn254.G2_B.c1 % bn254.P))
        pts = [bn254.G2.random_point(rng) for _ in range(M)]
        qts = [bn254.G2.random_point(rng) for _ in range(M)]

        def planes(ps):
            return (enc_t([p[0].c0 for p in ps]),
                    enc_t([p[0].c1 for p in ps]),
                    enc_t([p[1].c0 for p in ps]),
                    enc_t([p[1].c1 for p in ps]))

        x0, x1, y0, y1 = planes(pts)
        qx0, qx1, qy0, qy1 = planes(qts)
        one = enc_t([1] * M)
        zero = jnp.zeros_like(one)
        P = (x0, x1, y0, y1, one, zero)
        Q = (qx0, qx1, qy0, qy1)
        name = "fused_add2_bit_exact"
        ref = jax.block_until_ready(tc2.add_mixed_masked(P, Q, mask, sign))
        got = jax.block_until_ready(
            tc2.add_mixed_masked_fused(P, Q, mask, sign))
    else:
        tc = TCurve(F, 9)
        pts = [bn254.G1.random_point(rng) for _ in range(M)]
        qts = [bn254.G1.random_point(rng) for _ in range(M)]
        px, py = enc_t([p[0] for p in pts]), enc_t([p[1] for p in pts])
        qx, qy = enc_t([p[0] for p in qts]), enc_t([p[1] for p in qts])
        one = enc_t([1] * M)
        P = (px, py, one)
        Q = (qx, qy)
        name = "fused_add_bit_exact"
        ref = jax.block_until_ready(tc.add_mixed_masked(P, Q, mask, sign))
        got = jax.block_until_ready(
            tc.add_mixed_masked_fused(P, Q, mask, sign))

    exact = all(
        bool(jnp.array_equal(r, g)) for r, g in zip(ref, got)
    )
    print(json.dumps({"check": name, "lanes": M, "exact": exact}),
          flush=True)
    if not exact:
        for i, (r, g) in enumerate(zip(ref, got)):
            diff = int(jnp.sum(r != g))
            print(json.dumps({"plane": i, "mismatched": diff}), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
