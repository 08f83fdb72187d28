"""Device-resident quality→size bisection for the target-size engine.

Pairs with ops/jpeg_size.py: the binary search over JPEG quality that the
reference drives with one full host encode per step (targetsize.go:146-166)
runs here as a jitted lax.fori_loop — each step re-quantizes the cached
forward-DCT coefficients and evaluates the exact Huffman bit count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import dct as dct_ops
from ..ops.jpeg_size import scan_bits_device

MAX_STEPS = 7  # binary search over [1, 100]


def size_bisect_traceable(coefs, padded_h: int, padded_w: int,
                          subsample: bool, target_bytes: jax.Array,
                          lo0: jax.Array, hi0: jax.Array):
    """Traceable body of size_bisect_device — composable inside larger
    fused programs (e.g. the target-size engine's downsample→DCT→bisect
    scale probe, engine/targetsize.py)."""
    all_tables = jnp.asarray(dct_ops.all_quality_tables(),
                             dtype=jnp.float32)
    cy, ccb, ccr = coefs

    def scan_bytes(quality: jax.Array) -> jax.Array:
        qtab = jax.lax.dynamic_index_in_dim(all_tables, quality, axis=0,
                                            keepdims=False)
        qy = dct_ops.quantize_blocks(cy, qtab[0])
        qcb = dct_ops.quantize_blocks(ccb, qtab[1])
        qcr = dct_ops.quantize_blocks(ccr, qtab[1])
        bits = scan_bits_device(qy, qcb, qcr, padded_h, padded_w,
                                subsample)
        return (bits + 7) // 8

    def body(_, state):
        lo, hi, best_q, found = state
        active = lo <= hi
        mid = (lo + hi) // 2
        fits = scan_bytes(mid) <= target_bytes
        ok = jnp.logical_and(active, fits)
        best_q = jnp.where(ok, mid, best_q)
        found = jnp.logical_or(found, ok)
        lo = jnp.where(jnp.logical_and(active, ok), mid + 1, lo)
        hi = jnp.where(jnp.logical_and(active, jnp.logical_not(ok)),
                       mid - 1, hi)
        return lo, hi, best_q, found

    init = (lo0, hi0, jnp.int32(0), jnp.bool_(False))
    _, _, best_q, found = jax.lax.fori_loop(0, MAX_STEPS, body, init)
    return best_q, found


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def size_bisect_device(coefs, padded_h: int, padded_w: int,
                       subsample: bool, *, target_bytes: jax.Array,
                       lo0: jax.Array, hi0: jax.Array):
    """Highest quality in [lo0, hi0] whose scan fits target_bytes
    (header already subtracted by the caller).

    Returns (best_q int32, found bool).  Sizes are exact bit counts /8 —
    excludes 0xFF stuffing, so callers verify the winner's real bytes.
    """
    return size_bisect_traceable(coefs, padded_h, padded_w, subsample,
                                 target_bytes, lo0, hi0)
