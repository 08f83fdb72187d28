"""Measure the Pallas SSIM kernel's device time at B=1 vs B=64 (1080p).

VERDICT r2 #9 acceptance: single-pair 1080p SSIM device time within 2x
of its per-image share in a 64-batch.  Methodology per BENCH_NOTES.md:
one scalar output per timed jit; the axon tunnel's per-dispatch RPC
floor is measured with a trivial program and subtracted.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fennec_tpu.ops.ssim_pallas import batched_ssim_pallas

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    a64 = jnp.asarray(rng.uniform(0, 255, (64, h, w)).astype(np.float32))
    b64 = jnp.asarray(
        np.asarray(a64) + rng.normal(0, 3, (64, h, w)).astype(np.float32))
    a1, b1 = a64[:1], b64[:1]

    @jax.jit
    def run(a, b):
        return jnp.sum(batched_ssim_pallas(a, b))

    @jax.jit
    def rpc_floor(x):
        return jnp.sum(x * 2.0)

    tiny = jnp.ones((8, 8), jnp.float32)

    def timeit(fn, *args, iters=20):
        fn(*args).block_until_ready()  # warm/compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(*args).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    floor = timeit(rpc_floor, tiny)
    t1 = timeit(run, a1, b1) - floor
    t64 = timeit(run, a64, b64) - floor
    out = {
        "platform": jax.devices()[0].platform,
        "rpc_floor_ms": round(floor * 1e3, 2),
        "b1_ms": round(t1 * 1e3, 2),
        "b64_ms": round(t64 * 1e3, 2),
        "b64_per_image_ms": round(t64 / 64 * 1e3, 3),
        "b1_vs_share": round(t1 / (t64 / 64), 2),
        "b64_evals_per_sec": round(64 / t64, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
