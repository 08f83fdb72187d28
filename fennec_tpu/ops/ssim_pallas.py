"""Fused Pallas TPU kernel for windowed SSIM.

One grid step = one image pair; the kernel streams the pair through VMEM
in row bands (manual HBM→VMEM DMA with halo), computing the separable
8-tap Gaussian window, the five statistic maps, the SSIM formula, and the
partial-sum reduction entirely on-chip — the statistic maps never touch
HBM.  This is the structural twin of the reference's fused per-window
scalar loop with per-worker partial sums (ssim.go:110-160), with the VPU
playing the goroutines' role.

The jnp formulation in ops/ssim.py remains the fallback and correctness
oracle; parity is asserted in tests (interpret mode on CPU, real Mosaic
on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_window_1d
from .ssim import SSIM_C1, SSIM_C2, WINDOW_SIZE

try:  # Pallas is TPU/Mosaic specific; keep import guarded.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BAND = 128  # output rows processed per VMEM-resident band


def _wsum_factory():
    g = gaussian_window_1d(WINDOW_SIZE, 1.5)

    def wsum(x, axis, out_len):
        acc = None
        for k in range(WINDOW_SIZE):
            sl = jax.lax.slice_in_dim(x, k, k + out_len, axis=axis)
            term = sl * np.float32(g[k])
            acc = term if acc is None else acc + term
        return acc

    return wsum


def _make_kernel(oh_real: int, ow_real: int, w: int, n_bands: int):
    wsum = _wsum_factory()
    ow = w - WINDOW_SIZE

    def kernel(a_hbm, b_hbm, out_ref, sa, sb, sem_a, sem_b):
        i = pl.program_id(0)

        def band_copies(j, slot):
            row0 = j * BAND
            ca = pltpu.make_async_copy(
                a_hbm.at[i, pl.ds(row0, BAND + WINDOW_SIZE), :],
                sa.at[slot], sem_a.at[slot])
            cb = pltpu.make_async_copy(
                b_hbm.at[i, pl.ds(row0, BAND + WINDOW_SIZE), :],
                sb.at[slot], sem_b.at[slot])
            return ca, cb

        # Double-buffered band pipeline: band j+1's HBM→VMEM DMA is in
        # flight while band j's statistics compute, so the VPU never
        # stalls on memory between bands (matters most for B=1, where
        # there is no cross-image overlap to hide the band DMAs).
        ca0, cb0 = band_copies(0, 0)
        ca0.start()
        cb0.start()

        def band_body(j, acc):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_bands)
            def _prefetch():
                cn_a, cn_b = band_copies(j + 1, 1 - slot)
                cn_a.start()
                cn_b.start()

            ca, cb = band_copies(j, slot)
            ca.wait()
            cb.wait()
            a = sa[slot]
            b = sb[slot]
            stats = []
            for m in (a, b, a * a, b * b, a * b):
                t = wsum(m, axis=1, out_len=ow)
                stats.append(wsum(t, axis=0, out_len=BAND))
            mu_a, mu_b, raw_aa, raw_bb, raw_ab = stats
            sig_aa = raw_aa - mu_a * mu_a
            sig_bb = raw_bb - mu_b * mu_b
            sig_ab = raw_ab - mu_a * mu_b
            num = (2.0 * mu_a * mu_b + np.float32(SSIM_C1)) * \
                (2.0 * sig_ab + np.float32(SSIM_C2))
            den = (mu_a * mu_a + mu_b * mu_b + np.float32(SSIM_C1)) * \
                (sig_aa + sig_bb + np.float32(SSIM_C2))
            vals = num / den
            # Mask window positions past the real image (H was padded so
            # every band is full height; W to the 128-lane tiling).
            rows = (jax.lax.broadcasted_iota(jnp.int32, (BAND, ow), 0)
                    + j * BAND)
            vals = jnp.where(rows < oh_real, vals, 0.0)
            if ow_real < ow:
                cols = jax.lax.broadcasted_iota(jnp.int32, (BAND, ow), 1)
                vals = jnp.where(cols < ow_real, vals, 0.0)
            return acc + jnp.sum(vals)

        total = jax.lax.fori_loop(0, n_bands, band_body, jnp.float32(0.0))
        mean = total / np.float32(oh_real * ow_real)
        out_ref[pl.ds(i, 1), :] = mean.reshape(1, 1)

    return kernel


def _pad_to(x: jax.Array, h_pad: int, w_pad: int) -> jax.Array:
    ph = h_pad - x.shape[-2]
    pw = w_pad - x.shape[-1]
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnums=(2,))
def batched_ssim_pallas(lum_a: jax.Array, lum_b: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(B, H, W) float32 luminance pairs → (B,) mean windowed SSIM.

    Same window semantics as ops/ssim.windowed_ssim_device (centers
    y ∈ [4, h-4) × [4, w-4)).  H and W must exceed the 8px window;
    arbitrary W is handled by lane padding + masking.
    """
    bsz, h, w = lum_a.shape
    assert h > WINDOW_SIZE and w > WINDOW_SIZE, "image too small for SSIM"
    oh_real, ow_real = h - WINDOW_SIZE, w - WINDOW_SIZE
    n_bands = -(-oh_real // BAND)
    h_pad = n_bands * BAND + WINDOW_SIZE
    w_pad = -(-w // 128) * 128  # Mosaic DMA slices need 128-lane tiles
    lum_a = _pad_to(lum_a, h_pad, w_pad)
    lum_b = _pad_to(lum_b, h_pad, w_pad)

    kernel = _make_kernel(oh_real, ow_real, w_pad, n_bands)
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # (B, 1) result: one whole-array block revisited by every grid
        # step (Mosaic disallows 1x1 sub-blocks).
        out_specs=pl.BlockSpec((bsz, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BAND + WINDOW_SIZE, w_pad), jnp.float32),
            pltpu.VMEM((2, BAND + WINDOW_SIZE, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lum_a, lum_b)
    return out[:, 0]


def pallas_ssim_available() -> bool:
    if not HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
