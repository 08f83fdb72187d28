"""Batched (vmapped, lockstep) target-file-size engine.

The per-image engine (engine/targetsize.py) already runs each quality→size
bisection and each scale probe as one fused device dispatch, but a batch of
N images still pays ~15 dispatches per image — RPC-latency-bound on hosted
TPU links.  This module restructures the reference's 4-strategy search
(targetsize.go:26-348) over a whole same-shape bucket of images:

  * S1 (quality binary search, targetsize.go:125-176): ONE dispatch runs
    the vmapped forward DCT + exact-bit-count bisection for every image;
    byte verification (0xFF stuffing) and the optimal-Huffman ascent run
    as masked whole-batch encode rounds (2 dispatches each, usually 0-1
    rounds).
  * S3 (joint scale×quality, targetsize.go:210-281): the per-image binary
    scale searches advance in LOCKSTEP — at each iteration, images whose
    search state agrees on the probe scale share one vmapped
    downsample→DCT→bisect dispatch; the four fixed scales are one dispatch
    each for the whole bucket.  Probe geometries snap to the /16 lattice
    (engine/targetsize.py:probe_geometry) with per-(image, point)
    memoization, so the probe XLA program set stays bounded.  Final
    re-encodes group by output geometry.
  * S2 (median-cut palette PNG, targetsize.go:180-206): box splits run
    per image on the worker pool (host), but the nearest-palette mapping
    is ONE batched device argmin per level across all still-pending
    images (_palette_map_batched_jit), PNG deflate stays on the pool, and
    the winners' SSIM is one batched device call against the resident
    bucket stack.
  * S4 / fallback are rare (only when S1–S3 all fail) and stay per-image.

Candidate ranking (better_fit), the minJPEGQuality=20 floor, BPP-seeded
bounds, and the scale grids are identical to the per-image engine.  For
each image the chosen strategy, quality, and output geometry match
hit_target_size; output bytes normally match too, though a vmapped
Lanczos resize can round a single pixel differently from the per-image
resize (f32 knife-edge), shifting the entropy-coded size by a few bytes
(tests/test_targetsize_batched.py pins the equivalence contract).
"""

from __future__ import annotations

import concurrent.futures
import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..image import is_opaque, to_nrgba_ref
from ..ops import dct as dct_ops
from ..types import Context, Format, Options
from .size_search import size_bisect_traceable
from .targetsize import (
    MIN_JPEG_QUALITY,
    SizeResult,
    _bpp_bounds,
    _ctx_err,
    _fallback_encode,
    _header_len,
    better_fit,
    probe_geometry,
    scale_search,
)


def _pad_lanes(seq, pad_to: int = 0) -> np.ndarray:
    """Pow2-pad a lane-index list (first lane repeated) as int32 — the
    shared gather idiom that bounds device-program recompiles to pow2
    batch sizes."""
    seq = list(seq)
    padded = pad_to or _next_pow2(len(seq))
    return np.asarray(seq + [seq[0]] * (padded - len(seq)), np.int32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ── Jitted batch kernels ─────────────────────────────────────────────────────


@jax.jit
def _s1_stage1_jit(stack: jax.Array, budget: jax.Array, lo0: jax.Array,
                   hi0: jax.Array):
    """Vmapped forward DCT + exact-size quality bisection (4:2:0).

    stack: (B, H, W, 4) uint8/float.  Returns (q, found, coefs) with the
    unquantized coefficients left RESIDENT on device for the encode rounds.
    """
    h, w = int(stack.shape[1]), int(stack.shape[2])
    ph, pw = h + (-h) % 16, w + (-w) % 16

    def one(im):
        from ..codecs.jpeg import forward_dct_device

        coefs = forward_dct_device(im.astype(jnp.float32), True)
        q, found = size_bisect_traceable(coefs, ph, pw, True, budget,
                                         lo0, hi0)
        return q, found, jnp.concatenate(coefs, axis=0)

    return jax.vmap(one)(stack)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _quantize_hist_jit(coefs: jax.Array, qvec: jax.Array, h: int, w: int):
    """Quantize resident (B, NT, 64) coefficients at per-image qualities;
    also return per-class symbol histograms + the exact standard-table
    scan bit count (stage 1 of optimal-Huffman emission)."""
    from ..ops.jpeg_emit import scan_symbol_hist_device
    from ..ops.jpeg_size import bits_std_from_hist

    ph, pw = h + (-h) % 16, w + (-w) % 16
    ny = (ph // 8) * (pw // 8)
    nc = (ph // 16) * (pw // 16)
    all_tables = jnp.asarray(dct_ops.all_quality_tables(),
                             dtype=jnp.float32)

    def one(c, q):
        qtab = jax.lax.dynamic_index_in_dim(all_tables, q, axis=0,
                                            keepdims=False)
        qy = dct_ops.quantize_blocks(c[:ny], qtab[0])
        qcb = dct_ops.quantize_blocks(c[ny:ny + nc], qtab[1])
        qcr = dct_ops.quantize_blocks(c[ny + nc:], qtab[1])
        packed = jnp.concatenate([qy, qcb, qcr], axis=0).astype(jnp.int16)
        dcf, acf = scan_symbol_hist_device(qy, qcb, qcr, ph, pw, True)
        return packed, dcf, acf

    packed, dcf, acf = jax.vmap(one)(coefs, qvec)
    # Exact standard-table bit count = a dot over the histograms
    # (ops/jpeg_size.bits_std_from_hist) — no second coefficient pass.
    # Host-visible outputs ride in ONE (B, 545) int32 array (col 0
    # bits_std, 1:33 dc_freq, 33:545 ac_freq) — one tunnel round-trip.
    b = packed.shape[0]
    small = jnp.concatenate([
        bits_std_from_hist(dcf, acf).astype(jnp.int32)[:, None],
        dcf.reshape(b, -1).astype(jnp.int32),
        acf.reshape(b, -1).astype(jnp.int32)], axis=1)
    return packed, small


@jax.jit
def _scale_probe_batched_jit(stack: jax.Array, idx: jax.Array,
                             wh: jax.Array, wv: jax.Array,
                             budget: jax.Array, lo0: jax.Array,
                             hi0: jax.Array):
    """One lockstep scale probe for a group of images: gather the group
    from the resident source stack, box-downsample with the SHARED weight
    matrices (same source dims + same probe scale, device-resident via
    box_weights_device — no per-probe megabyte uploads), forward DCT, and
    run the exact-bit-count quality bisection — one dispatch per group."""
    from ..codecs.jpeg import forward_dct_device
    from ..ops.resize import box_downsample_device

    sub = stack[idx]

    def one(im):
        img = box_downsample_device(im.astype(jnp.float32), wh, wv)
        h, w = int(img.shape[0]), int(img.shape[1])
        ph, pw = h + (-h) % 16, w + (-w) % 16
        coefs = forward_dct_device(img, True)
        return size_bisect_traceable(coefs, ph, pw, True, budget, lo0, hi0)

    return jax.vmap(one)(sub)


@jax.jit
def _resize_group_jit(stack: jax.Array, idx: jax.Array, wh: jax.Array,
                      wv: jax.Array) -> jax.Array:
    """Gather a group and Lanczos-resize it with shared device-resident
    weights (lanczos_weights_device)."""
    from ..ops.resize import lanczos_resize_device

    return jax.vmap(
        lambda im: lanczos_resize_device(im.astype(jnp.float32), wh, wv)
    )(stack[idx])


# ── Host-side batch encode (optimal Huffman, byte-identical to the host
#    encoder — same two-stage emission as the standard-mode batch path) ──────

# EXPERIMENTAL (FENNEC_TS_FUSED=1): K.2 tables built ON DEVICE
# (ops/huffbuild.py) and the emission chained on resident handles — two
# async dispatches, ONE guarded pull, zero host table builds.  Default
# OFF: this call chain (unlike the batch engine's identical-looking
# FUSED_OPT chain) trips a jax-0.9 captured-constant runtime bug on
# repeat calls — "Execution supplied 2 buffers but compiled program
# expected 14 buffers" on CPU, "TPU backend error (InvalidArgument)" on
# TPU — even with one jit closure per (geometry, batch) signature.  The
# two-stage path below costs one extra pull per encode round and has
# been solid since r2.
TS_FUSED = os.environ.get("FENNEC_TS_FUSED", "0") == "1"

# Concurrent strategy speculation (S1 ∥ S2 ∥ S3) and concurrent S3
# final-geometry groups.  FENNEC_TS_CONC=0 restores the sequential
# cascade (debugging / pathological hosts).  FENNEC_TS_SPEC bounds how
# many bisection levels each probe wave speculates ahead (see
# _s3_batched): 0 restores one-wave-per-round probing.
TS_CONC = os.environ.get("FENNEC_TS_CONC", "1") != "0"
TS_SPEC = max(0, int(os.environ.get("FENNEC_TS_SPEC", "1")))


@functools.lru_cache(maxsize=64)
def _quantize_build_for(ph: int, pw: int, b: int):
    """Per-padded-geometry jitted dispatch 1 of the chained target-size
    encode: quantize resident (B, NT, 64) coefficients at per-image
    qualities, then histogram + device K.2 table build
    (parallel.batched._search_build_tail) — the packed coefficients and
    tables stay RESIDENT for the chained batched_emit_custom_hdr
    dispatch.

    One jit PER (padded geometry, batch size) — the padded dims are all
    the program depends on ((79,95) and (80,96) share a program) —
    rather than static_argnums: retracing/re-keying ONE jit wrapper for
    a second signature trips a jax-0.9 captured-constant bug on this
    call chain ("Execution supplied 2 buffers but compiled program
    expected 14 buffers": the hoisted device-array constants of the
    prior executable stop being supplied).  A closure per signature
    compiles exactly once and never retraces."""
    ny = (ph // 8) * (pw // 8)
    nc = (ph // 16) * (pw // 16)

    @jax.jit
    def f(coefs: jax.Array, qvec: jax.Array):
        from ..parallel.batched import _search_build_tail

        all_tables = jnp.asarray(dct_ops.all_quality_tables(),
                                 dtype=jnp.float32)

        def one(c, q):
            qtab = jax.lax.dynamic_index_in_dim(all_tables, q, axis=0,
                                                keepdims=False)
            qy = dct_ops.quantize_blocks(c[:ny], qtab[0])
            qcb = dct_ops.quantize_blocks(c[ny:ny + nc], qtab[1])
            qcr = dct_ops.quantize_blocks(c[ny + nc:], qtab[1])
            return jnp.concatenate([qy, qcb, qcr],
                                   axis=0).astype(jnp.int16)

        packed = jax.vmap(one)(coefs, qvec)
        b = packed.shape[0]
        return _search_build_tail(
            qvec, jnp.zeros((b,), jnp.float32),
            jnp.ones((b,), jnp.bool_), packed, ph, pw, True)

    return f


def _quantize_build_jit(coefs: jax.Array, qvec: jax.Array, h: int,
                        w: int):
    ph, pw = h + (-h) % 16, w + (-w) % 16
    return _quantize_build_for(ph, pw, int(coefs.shape[0]))(coefs, qvec)


def _encode_batch_fused(pool, coefs: jax.Array, qvec: np.ndarray,
                        h: int, w: int,
                        target_bytes: int) -> List[bytes]:
    """Fused encode round: 2 chained async dispatches + 1 guarded pull.

    Word capacity is sized statically from the target (the bisection
    winner's standard-table bits never exceed the budget, optimal tables
    only shrink, and ascent probes move one quality step ≈ ±10%); the
    rare overflow and the K.2 >32-bit-code flag fall back per lane to
    the two-stage host-table path."""
    from ..codecs.jpeg import _dht_segment_custom, assemble_jpeg
    from ..ops.jpeg_emit import finalize_scan_host
    from ..parallel.batched import (
        OPT_HDR,
        batched_emit_custom_hdr,
        specs_from_opt_header,
        split_opt_header,
    )

    b = len(qvec)
    qdev = jnp.asarray(qvec, dtype=jnp.int32)
    hdr_d, packed_d, tables_d = _quantize_build_jit(coefs, qdev, h, w)
    max_words = _next_pow2(target_bytes // 2 + 256)
    wb = batched_emit_custom_hdr(packed_d, tables_d, hdr_d, h, w, True,
                                 max_words)
    if (OPT_HDR + max_words) * b * 4 <= (8 << 20):
        wb_h = np.asarray(wb)
        hdr, words_h = wb_h[:, :OPT_HDR], wb_h[:, OPT_HDR:]
    else:
        hdr = np.asarray(wb[:, :OPT_HDR])
        bmax = int(hdr[:, 3].astype(np.int64).max())
        used = min(bmax // 32 + 2, max_words)
        words_h = np.asarray(wb[:, OPT_HDR:OPT_HDR + used])
    (_q, _s, _f, bits_h, ovf, bits16, nvals,
     vals) = split_opt_header(hdr)

    out: List[Optional[bytes]] = [None] * b
    qtabs = dct_ops.all_quality_tables()
    redo = [j for j in range(b)
            if bool(ovf[j]) or int(bits_h[j]) + 64 > max_words * 32]
    redo_set = set(redo)

    def emit(j: int) -> None:
        if j in redo_set:
            return
        scan = finalize_scan_host(words_h[j], int(bits_h[j]))
        dht = _dht_segment_custom(
            *specs_from_opt_header(bits16, nvals, vals, j))
        out[j] = assemble_jpeg(w, h, qtabs[int(qvec[j])], scan, True,
                               dht=dht)

    list(pool.map(emit, range(b)))
    if redo:  # rare: exact-sized two-stage encode for those lanes only
        idx = _pad_lanes(redo)
        sub = jnp.take(coefs, jnp.asarray(idx), axis=0)
        enc = _encode_two_stage(pool, sub, qvec[idx].astype(np.int32),
                                h, w)
        for k, j in enumerate(redo):
            out[j] = enc[k]
    return out  # type: ignore[return-value]


def _encode_batch_at(pool, coefs: jax.Array, qvec: np.ndarray,
                     h: int, w: int,
                     target_bytes: int = 0) -> List[bytes]:
    """Encode every image's resident coefficients at its own quality with
    per-image optimal Huffman tables (the target-size engine always
    optimizes, matching _JpegSizer).  Fused device-table path when a
    target is known; otherwise 2 device dispatches + 2 pulls."""
    if TS_FUSED and target_bytes > 0:
        return _encode_batch_fused(pool, coefs, qvec, h, w, target_bytes)
    return _encode_two_stage(pool, coefs, qvec, h, w)


def _encode_two_stage(pool, coefs: jax.Array, qvec: np.ndarray,
                      h: int, w: int) -> List[bytes]:
    """Two-stage encode: pull histograms, build K.2 tables on host,
    dispatch emission sized from the exact bit counts."""
    from ..codecs.huffopt import specs_and_tables_batch
    from ..codecs.jpeg import _dht_segment_custom, assemble_jpeg
    from ..ops.jpeg_emit import finalize_scan_host
    from ..parallel.batched import batched_emit_custom, pull_emit_words

    from ..ops import jpeg_emit as _je

    b = len(qvec)
    packed, small = _quantize_hist_jit(
        coefs, jnp.asarray(qvec, dtype=jnp.int32), h, w)
    sm = np.asarray(small)  # one pull: bits_std + both histograms
    dcf_h = sm[:, 1:33].reshape(-1, 2, 16).astype(np.int64)
    acf_h = sm[:, 33:545].reshape(-1, 2, 256).astype(np.int64)

    specs, dc_tabs, ac_tabs = specs_and_tables_batch(dcf_h, acf_h)
    # Optimal tables never exceed the standard-table bit count they are
    # built against, so the exact counts size the word buffer safely.
    max_words = _next_pow2(int(sm[:, 0].max()) // 32 + 64)
    tabs_dev = jnp.asarray(np.concatenate([dc_tabs, ac_tabs], axis=2))
    wb = batched_emit_custom(packed, tabs_dev, h, w, True, max_words,
                             _je.EMIT_LWORDS)
    words_h, bits_h, bovf = pull_emit_words(wb, max_words)
    redo: Dict[int, Tuple[np.ndarray, int]] = {}
    if bovf.any():
        # Some image's blocks outgrew the optimistic emit buffer (exact
        # flag): one safe-width re-emit of the whole batch covers the
        # flagged lanes (rare; a second dispatch beats per-lane jits).
        wb2 = batched_emit_custom(packed, tabs_dev, h, w, True,
                                  max_words, 0)
        words2, bits2, _ = pull_emit_words(wb2, max_words)
        for j in np.nonzero(bovf)[0]:
            redo[int(j)] = (words2[j], int(bits2[j]))

    out: List[Optional[bytes]] = [None] * b
    qtabs = dct_ops.all_quality_tables()

    def emit(j: int) -> None:
        words_j, bits_j = redo.get(j, (None, None))
        if words_j is None:
            words_j, bits_j = words_h[j], int(bits_h[j])
        scan = finalize_scan_host(words_j, bits_j)
        dht = _dht_segment_custom(*specs[j])
        out[j] = assemble_jpeg(w, h, qtabs[int(qvec[j])], scan, True,
                               dht=dht)

    list(pool.map(emit, range(b)))
    return out  # type: ignore[return-value]


def _encode_lanes(pool, coefs: jax.Array, qvec: np.ndarray,
                  sel: np.ndarray, h: int, w: int,
                  target_bytes: int = 0) -> List[Tuple[int, bytes]]:
    """Encode only the selected lanes of the resident coefficient stack,
    gathered into a sub-batch padded to the FULL stack width; returns
    (lane, bytes) pairs.  One lane count per geometry keeps every encode
    round on the ONE already-compiled program — pow2 sub-padding minted
    a program per (geometry, pow2 size) pair, and retracing the fused
    encode with a second batch size trips a jax-0.9 captured-constant
    bug ("Execution supplied 2 buffers but compiled program expected
    14": the retraced executable's hoisted device-array constants are
    not re-supplied at call time)."""
    b = int(coefs.shape[0])
    if len(sel) == b:
        enc = _encode_batch_at(pool, coefs, qvec.astype(np.int32), h, w,
                               target_bytes)
        return list(enumerate(enc))
    idx = _pad_lanes(sel, pad_to=b)
    sub = jnp.take(coefs, jnp.asarray(idx), axis=0)
    enc = _encode_batch_at(pool, sub, qvec[idx].astype(np.int32), h, w,
                           target_bytes)
    return [(int(sel[k]), enc[k]) for k in range(len(sel))]


def _s1_search_batch(pool, stack_dev: jax.Array, h: int, w: int,
                     target_bytes: int
                     ) -> Tuple[np.ndarray, np.ndarray, List[bytes],
                                jax.Array]:
    """Vectorized _JpegSizer.search over a resident stack.

    Returns (qualities (B,) int, ok (B,) bool, data list, resident coef
    stack) — ok[i] False
    means no quality in bounds fit (the per-image search returned None).
    Matches _JpegSizer.search per image: bisect on the exact bit-count
    oracle, verify real bytes stepping down, then probe up while the
    optimized encoding still fits (engine/targetsize.py:166-199).
    """
    lo, hi = _bpp_bounds(target_bytes, w * h)
    budget = max(0, target_bytes - _header_len(w, h))
    q_dev, found_dev, coefs = _s1_stage1_jit(
        stack_dev, jnp.int32(budget), jnp.int32(lo), jnp.int32(hi))
    for hh in (q_dev, found_dev):  # overlap the two small pulls
        try:
            hh.copy_to_host_async()
        except Exception:
            pass
    q = np.asarray(q_dev).astype(np.int64)
    ok = np.asarray(found_dev).copy()
    b = q.shape[0]
    data: List[Optional[bytes]] = [None] * b
    q = np.where(ok, q, lo)  # placeholder quality for dead lanes

    # Verify-down rounds: stuffing can push the real byte size past the
    # bit-count oracle; step those images down one quality per round.
    # Only still-pending lanes are re-encoded each round.
    pending = ok.copy()
    while pending.any():
        for j, e in _encode_lanes(pool, coefs, q,
                                  np.nonzero(pending)[0], h, w,
                                  target_bytes):
            if len(e) <= target_bytes:
                data[j] = e
                pending[j] = False
            else:
                q[j] -= 1
                if q[j] < lo:
                    ok[j] = False
                    pending[j] = False
                    q[j] = lo

    # Ascent rounds: optimized Huffman beats the standard-table oracle, so
    # a higher quality may fit — restore maximality (same loop as
    # _JpegSizer.search), encoding only the still-climbing lanes.
    climbing = ok & (q < hi)
    while climbing.any():
        trial = np.where(climbing, q + 1, q)
        for j, e in _encode_lanes(pool, coefs, trial,
                                  np.nonzero(climbing)[0], h, w,
                                  target_bytes):
            if len(e) <= target_bytes:
                q[j] += 1
                data[j] = e
                if q[j] >= hi:
                    climbing[j] = False
            else:
                climbing[j] = False

    return q, ok, data, coefs


# ── Batched strategies ───────────────────────────────────────────────────────


@jax.jit
def _palette_map_batched_jit(stack: jax.Array, idx: jax.Array,
                             palettes: jax.Array) -> jax.Array:
    """Map each gathered image's pixels to its own palette: stack
    (B, H, W, 4) resident bucket, idx (P,) lanes, palettes (P, 256, 3)
    float32 padded with large sentinels.  One dispatch per level for the
    whole bucket instead of one per image (argmin keeps the reference's
    first-match tie-break; sentinel rows never win).

    lax.map (not vmap) over lanes: even the fused (H·W, 256) score
    matrix is ~¼ GB at 500² — vmapping would multiply it by the lane
    count and spill HBM."""
    from ..ops.quantize import _palette_scores

    def one(args):
        i, pal = args
        im = jax.lax.dynamic_index_in_dim(stack, i, axis=0,
                                          keepdims=False)
        rgb = im[..., :3].astype(jnp.float32).reshape(-1, 3)
        return jnp.argmin(_palette_scores(rgb, pal),
                          axis=-1).astype(jnp.int32).reshape(
            im.shape[0], im.shape[1])

    return jax.lax.map(one, (idx, palettes))


def _s2_batched(pool, stack_dev, arrs: List[np.ndarray],
                target_bytes: int,
                idxs: List[int]) -> List[Optional[SizeResult]]:
    """Strategy 2 for the bucket (reference targetsize.go:180-206):
    median-cut box splits on the host pool, ONE palette-map dispatch per
    level for all still-pending images, PNG deflate on the pool, and one
    batched SSIM dispatch for every winner.  Per-image results identical
    to quantize_strategy."""
    from ..codecs import png as png_codec
    from ..ops.quantize import median_cut_levels, palette_to_nrgba
    from ..parallel.batched import batched_ssim_fast

    b = len(arrs)
    out: List[Optional[SizeResult]] = [None] * b
    if not idxs:
        return out
    h, w = arrs[0].shape[:2]
    pending = list(idxs)
    winners: List[Tuple[int, bytes, np.ndarray]] = []
    LEVELS = (256, 128, 64, 32, 16)
    # One median-cut run per image snapshots every level's palette.
    level_pals: Dict[int, dict] = {}

    for max_colors in LEVELS:
        if not pending:
            break
        pals: List[Optional[np.ndarray]] = [None] * len(pending)

        def build(k: int) -> None:
            i = pending[k]
            if i not in level_pals:
                level_pals[i] = median_cut_levels(arrs[i], LEVELS)
            pals[k] = level_pals[i][max_colors]

        list(pool.map(build, range(len(pending))))
        lanes = _pad_lanes(pending)
        padded = len(lanes)
        pal_stack = np.full((padded, 256, 3), 1e9, np.float32)
        for k, pal in enumerate(pals):
            pal_stack[k, :pal.shape[0]] = pal[:, :3].astype(np.float32)
        idx_dev = _palette_map_batched_jit(stack_dev, jnp.asarray(lanes),
                                           jnp.asarray(pal_stack))
        idx_host = np.asarray(idx_dev).astype(np.uint8)

        datas: List[Optional[bytes]] = [None] * len(pending)

        def encode(k: int) -> None:
            datas[k] = png_codec.encode_png_paletted(idx_host[k], pals[k])

        list(pool.map(encode, range(len(pending))))
        nxt = []
        for k, i in enumerate(pending):
            if len(datas[k]) <= target_bytes:
                quantized = palette_to_nrgba(idx_host[k], pals[k])
                winners.append((i, datas[k], quantized))
            else:
                nxt.append(i)
        pending = nxt

    if winners:
        # a-side: gather from the resident bucket stack (re-uploading the
        # originals costs ~1 MB/image over the hosted link for nothing);
        # b-side: the palettized pixels exist only on host.
        a_dev = jnp.take(stack_dev,
                         jnp.asarray(np.asarray(
                             [i for i, _, _ in winners], np.int32)),
                         axis=0)
        b_stack = np.stack([qimg for _, _, qimg in winners])
        ssims = batched_ssim_fast(a_dev, b_stack)
        for m, (i, data, qimg) in enumerate(winners):
            out[i] = SizeResult(data=data, format=Format.PNG, quality=0,
                                ssim=float(ssims[m]), final_w=w,
                                final_h=h, img=qimg)
    return out


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _ssim_at_q_jit(stack, coefs_cat, qvec, box_wh, box_wv,
                   h: int, w: int, use_pallas: bool):
    """SSIMFast of each lane's reconstruction-at-quality vs its source.

    The emitted winner file's coefficients ARE quantize(coefs, q), so
    reconstructing from the RESIDENT unquantized coefficients at the
    winning quality is bit-identical to decoding the produced JPEG —
    and skips a 25 MB coefficient re-upload per bucket (the old decode
    path was transfer-bound on hosted links)."""
    from .compress import _box_down_plane, _reconstruct_rgb

    ph, pw = h + (-h) % 16, w + (-w) % 16
    ny = (ph // 8) * (pw // 8)
    nc = (ph // 16) * (pw // 16)
    all_tables = jnp.asarray(dct_ops.all_quality_tables(),
                             dtype=jnp.float32)
    qtabs = jnp.take(all_tables, qvec, axis=0)
    needs_ds = (box_wh.shape[0] != w) or (box_wv.shape[0] != h)

    def lum_of(rgb):
        if needs_ds:
            r = _box_down_plane(rgb[..., 0], box_wh, box_wv)
            g = _box_down_plane(rgb[..., 1], box_wh, box_wv)
            b = _box_down_plane(rgb[..., 2], box_wh, box_wv)
            return 0.299 * r + 0.587 * g + 0.114 * b
        return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2])

    lum_a = jax.vmap(lambda im: lum_of(im[..., :3].astype(jnp.float32))
                     )(stack)
    lum_b = jax.vmap(lambda c, qt: lum_of(_reconstruct_rgb(
        (c[:ny], c[ny:ny + nc], c[ny + nc:]), qt, ph, pw, True, h, w))
    )(coefs_cat, qtabs)
    if use_pallas:
        from ..ops.ssim_pallas import batched_ssim_pallas

        return batched_ssim_pallas(lum_a, lum_b)
    from ..ops.ssim import ssim_map_device

    return jax.vmap(lambda a, b: jnp.mean(ssim_map_device(a, b))
                    )(lum_a, lum_b)


def _s1_batched(pool, stack_dev, arrs: List[np.ndarray], h: int, w: int,
                target_bytes: int,
                idxs: List[int]) -> List[Optional[SizeResult]]:
    """Strategy 1 for the bucket's JPEG-eligible subset only (reference
    targetsize.go:125-176) — images excluded from idxs (e.g. transparent
    under AUTO) are never searched, mirroring _s3_batched."""
    from ..parallel.batched import batched_ssim_fast

    b = len(arrs)
    out: List[Optional[SizeResult]] = [None] * b
    if not idxs:
        return out
    if len(idxs) == b:
        sub_dev = stack_dev
    else:
        sub_dev = jnp.take(stack_dev, jnp.asarray(_pad_lanes(idxs)),
                           axis=0)
    q, ok, data, coefs = _s1_search_batch(pool, sub_dev, h, w,
                                          target_bytes)
    winners = [(k, i) for k, i in enumerate(idxs) if ok[k]]
    if not winners:
        return out

    # SSIM of every winner vs its source: reconstruct from the RESIDENT
    # coefficients at the winning quality (bit-identical to decoding the
    # emitted file) and score in ONE dispatch — no coefficient
    # re-upload, no per-winner decode round-trips.
    from ..ops.resize import box_weights_device
    from ..ops.ssim import ssim_fast_dims
    from .compress import _use_pallas_ssim

    ds_w, ds_h = ssim_fast_dims(w, h)
    if ds_w > 8 and ds_h > 8:
        wh_d, wv_d = box_weights_device(w, h, ds_w, ds_h)
        qfin = np.where(ok, q, 1).astype(np.int32)
        ssims_all = np.asarray(_ssim_at_q_jit(
            sub_dev, coefs, jnp.asarray(qfin), wh_d, wv_d, h, w,
            _use_pallas_ssim()))
        ssims = [float(ssims_all[k]) for k, _ in winners]
    else:  # tiny bucket: decode + pixel-SSIM routing (rare)
        from ..codecs.jpeg import decode_jpeg

        decoded = [decode_jpeg(data[k]) for k, _ in winners]
        a_stack = np.stack([arrs[i] for _, i in winners])
        ssims = batched_ssim_fast(a_stack, np.stack(decoded))

    for m, (k, i) in enumerate(winners):
        out[i] = SizeResult(data=data[k], format=Format.JPEG,
                            quality=int(q[k]), ssim=float(ssims[m]),
                            final_w=w, final_h=h, img=arrs[i])
    return out


@jax.jit
def _stack_bucket_jit(parts):
    """Stack a bucket's per-image device arrays on DEVICE.  Specializes
    on (count, H, W) — the same signature every downstream bucket jit
    (_s1_stage1_jit etc.) already specializes on, so this mints no new
    program axis while skipping the host-side np.stack copy."""
    return jnp.stack(parts)


def _probe_scales_dispatch(stack_dev, group: List[int], w: int, h: int,
                           new_w: int, new_h: int, target_bytes: int,
                           pad_to: int = 0):
    """Dispatch one lockstep probe (ASYNC — the caller collects): device
    handles for (quality, fits) per image in `group` at new_w×new_h
    (callers pass lattice-snapped geometry — see probe_geometry).
    Dispatch/collect are split so one bisection round's geometry groups
    all enter the device queue before the first result is pulled —
    dispatch RPC latency overlaps device compute on hosted links.
    `pad_to` pins the padded lane count for the whole search so divergent
    group sizes don't mint extra XLA programs per geometry."""
    from ..ops.resize import box_weights_device

    wh, wv = box_weights_device(w, h, new_w, new_h)
    lo, hi = _bpp_bounds(target_bytes, new_w * new_h)
    budget = max(0, target_bytes - _header_len(new_w, new_h))
    idx = _pad_lanes(group, pad_to)
    return _scale_probe_batched_jit(
        stack_dev, jnp.asarray(idx), wh, wv,
        jnp.int32(budget), jnp.int32(lo), jnp.int32(hi))


def _probe_collect(handles, n: int) -> Tuple[np.ndarray, np.ndarray]:
    qv, fv = handles
    return np.asarray(fv)[:n], np.asarray(qv)[:n]


def _s3_batched(ctx, pool, stack_dev, arrs: List[np.ndarray], h: int,
                w: int, target_bytes: int,
                idxs: List[int]) -> List[Optional[SizeResult]]:
    """Strategy 3 for the bucket: lockstep binary scale search + fixed
    scale grid + grouped final encodes (reference targetsize.go:210-281)."""
    from ..parallel.batched import batched_ssim_fast

    b = len(arrs)
    out: List[Optional[SizeResult]] = [None] * b
    if not idxs:
        return out

    # Per-image binary search state over scale ∈ [0.05, 1.0], 10 rounds.
    lo_s = {i: 0.05 for i in idxs}
    hi_s = {i: 1.0 for i in idxs}
    best: Dict[int, Tuple[float, int]] = {}
    # (i, nw, nh) → (fits, q) at lattice-snapped probe geometry.  The
    # bisection's midpoints converge, so late rounds mostly re-ask lattice
    # points already measured — those are answered without a dispatch.
    memo: Dict[Tuple[int, int, int], Tuple[bool, int]] = {}
    # One padded lane count for every probe in this search: with per-group
    # pow2 padding each (geometry × group-size) pair would be a distinct
    # XLA program; probes are tiny, compiles are not.
    pad_to = _next_pow2(len(idxs))

    def probe_round(pairs) -> None:
        """Measure every (image, snapped geometry) pair, batching by
        geometry and skipping memo hits; results land in `memo`."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, geom in pairs:
            if (i, *geom) not in memo and i not in groups.get(geom, ()):
                groups.setdefault(geom, []).append(i)
        # Dispatch every geometry group's probe before pulling the first
        # result — divergent per-image mids can fragment the round into
        # many groups, and a sync per group serializes RPC latency.
        inflight = [(geom, group, _probe_scales_dispatch(
            stack_dev, group, w, h, geom[0], geom[1], target_bytes,
            pad_to)) for geom, group in groups.items()]
        # Start EVERY group's device→host copy before the first blocking
        # pull: the serial per-group np.asarray loop paid one ~0.1-0.2 s
        # tunnel RTT per group (round-5b warm profile: 11 groups ≈ 2.2 s
        # of a 3.0 s n=64 bucket); async copies overlap into ~one RTT
        # plus the (tiny) transfer times.
        for _, _, handles in inflight:
            for hh in handles:
                try:
                    hh.copy_to_host_async()
                except Exception:
                    pass  # non-jax handle / backend without async copy
        for geom, group, handles in inflight:
            fits, qs = _probe_collect(handles, len(group))
            for k, i in enumerate(group):
                memo[(i, *geom)] = (bool(fits[k]), int(qs[k]))

    def _spec_geoms(lo: float, hi: float, depth: int, acc: set) -> None:
        """Snapped geometries of every bisection node reachable within
        `depth` more levels from interval (lo, hi) — BOTH branch
        outcomes — mirroring the round body below exactly (the too-small
        rule advances lo without probing, consuming a level)."""
        mid = (lo + hi) / 2
        nw, nh = int(w * mid), int(h * mid)
        if nw < 8 or nh < 8:
            if depth > 0:
                _spec_geoms(mid, hi, depth - 1, acc)
            return
        acc.add(probe_geometry(w, h, nw, nh))
        if depth > 0:
            _spec_geoms(mid, hi, depth - 1, acc)
            _spec_geoms(lo, mid, depth - 1, acc)

    fixed = []
    for scale in (0.75, 0.50, 0.375, 0.25):
        nw, nh = int(w * scale), int(h * scale)
        if nw >= 8 and nh >= 8:
            fixed.append((scale, probe_geometry(w, h, nw, nh)))

    r = 0
    while r < 10:
        if _ctx_err(ctx):
            break
        # Speculative wave: dispatch this round's probes plus every
        # probe the next TS_SPEC rounds COULD ask for (both bisection
        # branches per level, snapped mids cluster hard across the
        # bucket), all before the first pull — then the rounds below
        # replay from the memo with zero further device sync.  The
        # extra probes cost scale²-sized device FLOPs in an already
        # async wave; each avoided wave saves a full dispatch→pull RPC
        # round, which dominates on hosted links (round-5b profile:
        # 9 collect waves ≈ 3.1 s of a 5.0 s n=64 bucket).  The fixed
        # scale grid rides the first wave instead of paying its own.
        spec = min(TS_SPEC, 9 - r)
        pairs = [(i, geom) for _, geom in fixed
                 for i in idxs] if r == 0 else []
        if spec:
            for i in idxs:
                acc: set = set()
                _spec_geoms(lo_s[i], hi_s[i], spec, acc)
                pairs.extend((i, g) for g in acc)
        for _ in range(spec + 1):
            want: Dict[int, Tuple[int, int]] = {}
            mids: Dict[int, float] = {}
            for i in idxs:
                mid = (lo_s[i] + hi_s[i]) / 2
                mids[i] = mid
                nw, nh = int(w * mid), int(h * mid)
                if nw < 8 or nh < 8:
                    lo_s[i] = mid  # too small (targetsize.go:247-250)
                    continue
                want[i] = probe_geometry(w, h, nw, nh)
            if pairs:
                probe_round(pairs + list(want.items()))
                pairs = []
            else:
                probe_round(want.items())
            for i, geom in want.items():
                fits, q = memo[(i, *geom)]
                if fits and q >= MIN_JPEG_QUALITY:
                    best[i] = (mids[i], q)
                    lo_s[i] = mids[i]
                else:
                    hi_s[i] = mids[i]
            r += 1
            if r >= 10:
                break

    if not _ctx_err(ctx):
        probe_round((i, geom) for _, geom in fixed for i in idxs)
        for scale, geom in fixed:
            for i in idxs:
                fits, q = memo[(i, *geom)]
                if fits and q >= MIN_JPEG_QUALITY:
                    if i not in best or scale > best[i][0]:
                        best[i] = (scale, q)

    if not best:
        return out

    # Final: group winners by output geometry; Lanczos-resize each group
    # with shared weights, re-run the full S1 on the scaled stack, and
    # score SSIM vs the ORIGINAL (upscale + SSIMFast, batched).
    finals: Dict[Tuple[int, int], List[int]] = {}
    for i, (scale, _q) in best.items():
        fw, fh = int(w * scale), int(h * scale)
        finals.setdefault((fw, fh), []).append(i)

    def _final_group(fw: int, fh: int, group: List[int]) -> None:
        if _ctx_err(ctx):
            return
        from ..ops.resize import lanczos_weights_device

        idx = _pad_lanes(group)
        padded = len(idx)
        dwh, dwv = lanczos_weights_device(w, h, fw, fh)
        scaled_dev = _resize_group_jit(stack_dev, jnp.asarray(idx),
                                       dwh, dwv)
        q2, ok2, data2, _coefs2 = _s1_search_batch(
            pool, scaled_dev, fh, fw, target_bytes)
        # SSIM vs original: upscale the scaled image back to source dims
        # (compute_ssim_nrgba semantics, targetsize.go:563-568).  Both
        # sides stay device-resident — the originals are gathered from
        # the bucket stack, the upscale feeds the scorer directly.
        uwh, uwv = lanczos_weights_device(fw, fh, w, h)
        up_dev = _resize_group_jit(scaled_dev,
                                   jnp.asarray(
                                       np.arange(padded, dtype=np.int32)),
                                   uwh, uwv)
        a_dev = jnp.take(stack_dev, jnp.asarray(idx), axis=0)
        ssims = batched_ssim_fast(a_dev, up_dev)
        # Candidate pixels stay device-resident: only the candidate that
        # WINS the better_fit ranking is pulled (S1 usually wins, so a
        # full scaled-stack pull is mostly wasted tunnel time).
        def _fetch(dev=scaled_dev, lane=0):
            return np.asarray(
                jax.lax.dynamic_index_in_dim(dev, lane, axis=0,
                                             keepdims=False),
                dtype=np.uint8)

        for k, i in enumerate(group):
            if not ok2[k] or int(q2[k]) < MIN_JPEG_QUALITY:
                continue
            out[i] = SizeResult(data=data2[k], format=Format.JPEG,
                                quality=int(q2[k]), ssim=float(ssims[k]),
                                final_w=fw, final_h=fh,
                                img_fetch=functools.partial(
                                    _fetch, scaled_dev, k))

    # Each geometry group's final (resize → S1 re-search → upscale SSIM)
    # is independent and pays several dispatch/pull round-trips; running
    # groups on their own threads overlaps that RPC latency (each group
    # writes disjoint `out` lanes, and JAX dispatch is thread-safe).
    # A dedicated executor — the groups' inner encode rounds use `pool`
    # themselves, so running groups ON `pool` could starve its workers.
    finals_exec = concurrent.futures.ThreadPoolExecutor(
        min(4, max(1, len(finals))) if TS_CONC else 1)
    try:
        list(finals_exec.map(
            lambda kv: _final_group(kv[0][0], kv[0][1], kv[1]),
            finals.items()))
    finally:
        finals_exec.shutdown()
    return out


# ── Public entry ─────────────────────────────────────────────────────────────


def hit_target_size_batched(ctx: Optional[Context],
                            arrs: List[np.ndarray], target_bytes: int,
                            opts: Options) -> List[SizeResult]:
    """Target-size engine over a same-shape bucket of NRGBA images.

    Per-image results are identical to engine/targetsize.py:hit_target_size
    (same strategies, same ranking); the searches run batched/lockstep on
    device.  Caller guarantees all images share (H, W).
    """
    b = len(arrs)
    h, w = arrs[0].shape[:2]
    arrs = [to_nrgba_ref(a) for a in arrs]
    want_png = opts.format == Format.PNG
    want_jpeg = opts.format == Format.JPEG

    jpeg_idx = [i for i in range(b)
                if want_jpeg or (not want_png and is_opaque(arrs[i]))]
    candidates: List[List[SizeResult]] = [[] for _ in range(b)]

    nworkers = min(16, os.cpu_count() or 4)
    pool = concurrent.futures.ThreadPoolExecutor(nworkers)
    try:
        stack_dev = None
        if (jpeg_idx or not want_jpeg) and not _ctx_err(ctx):
            # Upload the bucket ONCE (uint8); every S1/S2/S3 probe
            # reuses it.  One batched device_put of the per-image
            # arrays + an on-device stack: np.stack alone costs ~0.9 s
            # per 64×500² bucket on this memory-bandwidth-starved host
            # (round-5b measurement), and the transfer serializer reads
            # the source buffers either way.
            parts = jax.device_put(arrs)
            stack_dev = _stack_bucket_jit(tuple(parts))

        # The three strategies are independent until the better_fit
        # ranking (hit_target_size runs ALL of them, no early exit —
        # targetsize.go:26-75 collects candidates the same way), so
        # speculate them CONCURRENTLY: each strategy's device dispatches
        # and host work (median-cut, PNG deflate, scan finalize)
        # interleave, overlapping dispatch-RPC latency that a sequential
        # cascade pays three times over on hosted links.  JAX dispatch
        # is thread-safe; the device serializes execution, so results
        # are byte-identical to the sequential order.
        strat_exec = concurrent.futures.ThreadPoolExecutor(
            3 if TS_CONC else 1)
        futs = {}
        if jpeg_idx and not _ctx_err(ctx):
            futs["s1"] = strat_exec.submit(
                _s1_batched, pool, stack_dev, arrs, h, w, target_bytes,
                jpeg_idx)
        if not want_jpeg and not _ctx_err(ctx):
            # S2: median-cut on the pool, palette map batched on device
            # (one dispatch per level), PNG deflate on the pool.
            futs["s2"] = strat_exec.submit(
                _s2_batched, pool, stack_dev, arrs, target_bytes,
                list(range(b)))
        if jpeg_idx and not _ctx_err(ctx):
            futs["s3"] = strat_exec.submit(
                _s3_batched, ctx, pool, stack_dev, arrs, h, w,
                target_bytes, jpeg_idx)
        try:
            if "s1" in futs:
                s1 = futs["s1"].result()
                for i in jpeg_idx:
                    r = s1[i]
                    if r is not None and r.quality >= MIN_JPEG_QUALITY:
                        candidates[i].append(r)
            if "s2" in futs:
                s2 = futs["s2"].result()
                for i in range(b):
                    if s2[i] is not None:
                        candidates[i].append(s2[i])
            if "s3" in futs:
                s3 = futs["s3"].result()
                for i in jpeg_idx:
                    if s3[i] is not None:
                        candidates[i].append(s3[i])
        finally:
            strat_exec.shutdown()

        results: List[Optional[SizeResult]] = [None] * b
        for i in range(b):
            if not candidates[i]:
                continue
            bst = candidates[i][0]
            for c in candidates[i][1:]:
                if better_fit(c, bst, target_bytes):
                    bst = c
            results[i] = bst.materialize()

        # S4 + fallback: only images with no candidate (rare) — per image.
        for i in range(b):
            if results[i] is not None:
                continue
            can_jpeg = i in jpeg_idx
            if not _ctx_err(ctx):
                fmt = opts.format
                if fmt == Format.AUTO:
                    fmt = Format.JPEG if can_jpeg else Format.PNG
                r = scale_search(ctx, arrs[i], target_bytes, fmt)
                if r is not None:
                    results[i] = r
                    continue
            results[i] = _fallback_encode(arrs[i], target_bytes,
                                          can_jpeg, opts)
        return results  # type: ignore[return-value]
    finally:
        pool.shutdown()
