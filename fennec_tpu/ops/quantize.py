"""Median-cut color quantization: host box-splitting + device palette map.

The reference walks every pixel with a hash-cache nearest-palette loop
(targetsize.go:488-527); here the nearest-palette mapping is a single
device argmin over (pixels × palette) distances — exact, not cached-
approximate.  Box splitting (targetsize.go:422-486) is host numpy over a
strided ~100k-pixel sample — stride = total // 100k, the reference's
exact policy (floor division admits up to ~2× the nominal cap for sizes
just above 100k, matching targetsize.go:426-433).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _box_score(px: np.ndarray) -> int:
    if px.shape[0] < 2:
        return -1
    mins = px.min(axis=0)
    maxs = px.max(axis=0)
    volume = int(np.prod(maxs - mins + 1))
    return volume * px.shape[0]


def _palette_of(boxes) -> np.ndarray:
    palette = np.zeros((len(boxes), 4), dtype=np.uint8)
    for i, b in enumerate(boxes):
        if b.shape[0] == 0:
            palette[i] = (0, 0, 0, 255)
        else:
            mean = b.sum(axis=0) // b.shape[0]  # integer mean like Go
            palette[i, :3] = mean.astype(np.uint8)
            palette[i, 3] = 255
    return palette


def median_cut_levels(img: np.ndarray, levels) -> dict:
    """Median-cut palettes for SEVERAL target sizes in one greedy run.

    The split sequence (largest volume×population box, longest RGB axis,
    pixel median; reference targetsize.go:422-486) is greedy and
    independent of the stop count, so the box state at L boxes is
    exactly median_cut(img, L)'s — one run snapshots every level the
    target-size engine probes (256→16) instead of five from-scratch
    runs.  Box scores are maintained incrementally (only a split's two
    children are rescored), not recomputed for every box per iteration.

    Returns {level: (N≤level, 4) uint8 RGBA palette}.
    """
    flat = img.reshape(-1, 4)[:, :3]
    total = flat.shape[0]
    max_samples = 100000
    step = max(1, total // max_samples) if total > max_samples else 1
    pixels = flat[::step].astype(np.int32)
    targets = sorted(set(int(x) for x in levels))
    if pixels.size == 0:
        pal = np.array([[0, 0, 0, 255]], dtype=np.uint8)
        return {t: pal for t in targets}

    boxes = [pixels]
    scores = [_box_score(pixels)]
    out = {}
    remaining = list(targets)
    while remaining:
        if len(boxes) >= remaining[0]:
            out[remaining.pop(0)] = _palette_of(boxes)
            continue
        best = int(np.argmax(scores))
        if scores[best] <= -1:
            break
        px = boxes[best]
        spans = px.max(axis=0) - px.min(axis=0)
        # Longest axis, ties resolved R ≥ G ≥ B like the reference
        # (targetsize.go:387-398).
        if spans[0] >= spans[1] and spans[0] >= spans[2]:
            axis = 0
        elif spans[1] >= spans[2]:
            axis = 1
        else:
            axis = 2
        order = np.argsort(px[:, axis], kind="stable")
        px = px[order]
        mid = px.shape[0] // 2
        boxes[best] = px[:mid]
        boxes.append(px[mid:])
        scores[best] = _box_score(boxes[best])
        scores.append(_box_score(boxes[-1]))
    for t in remaining:
        out[t] = _palette_of(boxes)
    return out


def median_cut(img: np.ndarray, max_colors: int) -> np.ndarray:
    """Build an (N≤max_colors, 4) uint8 RGBA palette via median cut
    (reference targetsize.go:422-486)."""
    return median_cut_levels(img, (max_colors,))[max_colors]


def _palette_scores(rgb: jax.Array, palette: jax.Array) -> jax.Array:
    """(N, P) score with argmin identical to squared-RGB-distance
    argmin: |p|² − 2·r·p (the |r|² term is constant per pixel).

    Written as three broadcasted products so XLA fuses it into the
    argmin reduction — the naive (N, P, 3) difference tensor is ~¾ GB
    at 500²/256 colors.  All quantities are small integers, exact in
    float32, so ties break on exact values (first match, like the
    reference's scan order)."""
    pal_sq = jnp.sum(palette * palette, axis=-1)
    cross = (rgb[:, 0:1] * palette[None, :, 0]
             + rgb[:, 1:2] * palette[None, :, 1]
             + rgb[:, 2:3] * palette[None, :, 2])
    return pal_sq[None, :] - 2.0 * cross


@functools.partial(jax.jit, static_argnums=())
def _nearest_palette_device(rgb: jax.Array, palette: jax.Array) -> jax.Array:
    """(N, 3) float32 pixels × (P, 3) float32 palette → (N,) int32 argmin
    of squared RGB distance."""
    return jnp.argmin(_palette_scores(rgb, palette),
                      axis=-1).astype(jnp.int32)


def apply_palette(img: np.ndarray,
                  palette: np.ndarray) -> np.ndarray:
    """Map every pixel to its nearest palette entry (squared RGB distance,
    first-match tie-break like the reference scan order,
    targetsize.go:488-527).  Returns (H, W) uint8 indices."""
    h, w = img.shape[:2]
    rgb = jnp.asarray(img.reshape(-1, 4)[:, :3], dtype=jnp.float32)
    pal = jnp.asarray(palette[:, :3], dtype=jnp.float32)
    idx = np.asarray(_nearest_palette_device(rgb, pal))
    return idx.reshape(h, w).astype(np.uint8)


def palette_to_nrgba(indices: np.ndarray,
                     palette: np.ndarray) -> np.ndarray:
    """Expand indices back to NRGBA (reference targetsize.go:529-545)."""
    return palette[indices]
