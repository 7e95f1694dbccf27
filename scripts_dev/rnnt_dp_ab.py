"""A/B the RNN-T DP kernel's example packing: v1 lane-only vs v2 sublane+lane.

Round 5 changed `_pack_shape` to stack S example-groups into the sublane dim
([S, G·U1p] row ops in dense (8,128) vregs) in addition to the round-1..4
lane packing ([1, G·U1p] rows at 1/8 sublane utilization). This canary times
`_rnnt_forward` (skew + single-kernel fwd+bwd+grads + unskew) at bench
shapes under both packings by monkeypatching `_pack_shape`, on distinct
inputs per iteration (the axon runtime caches identical executions).

Usage: python scripts_dev/rnnt_dp_ab.py [B T U] (default 16 400 128)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.ops.pallas import rnnt_kernel as rk

    b, t, u = (int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 else (16, 400, 128)
    u1 = u + 1
    k = 6  # scanned reps per jit call (amortizes the ~40-120 ms relay latency)

    tl = jnp.full((b,), t, jnp.int32)
    ul = jnp.full((b,), u, jnp.int32)

    def run(tag, pack_fn):
        orig = rk._pack_shape
        rk._pack_shape = pack_fn
        try:
            @jax.jit
            def multi(bls, ems):
                def body(c, x):
                    bl, em = x
                    loss, gbl, gem = rk._rnnt_forward(bl, em, tl, ul, False)
                    return c, jnp.sum(loss) + jnp.sum(gbl) + jnp.sum(gem)

                return jax.lax.scan(body, 0.0, (bls, ems))[1]

            def mk(seed):
                kk = jax.random.split(jax.random.PRNGKey(seed))
                bl = -jnp.abs(jax.random.normal(kk[0], (k, b, t, u1), jnp.float32))
                em = -jnp.abs(jax.random.normal(kk[1], (k, b, t, u1), jnp.float32))
                return bl, em

            out = multi(*mk(0))
            np.asarray(out)
            times = []
            for i in range(1, 4):
                xs = mk(i)
                t0 = time.perf_counter()
                out = multi(*xs)
                np.asarray(out)
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times)) / k * 1e3
            subl, grp = pack_fn(b, t + u1, rk._padded_lanes(u1))
            print(json.dumps({"variant": tag, "ms": round(ms, 2), "subl": subl, "group": grp}), flush=True)
        finally:
            rk._pack_shape = orig

    v2 = rk._pack_shape

    def lane_only(gmax):
        def pack(batch, d_total, u1p):
            budget = 80 * 1024 * 1024
            per_example = d_total * u1p * 4 * 9
            g = gmax
            while g > 1 and g * per_example > budget:
                g //= 2
            return 1, g

        return pack

    for tag, fn in [
        ("g8_lane_only", lane_only(8)),
        ("g16_lane_only", lane_only(16)),
        ("v2_sublane", v2),
    ]:
        run(tag, fn)


if __name__ == "__main__":
    main()
