"""Device-side JPEG entropy ENCODING: Huffman bit emission on TPU.

Goes one step beyond the size oracle (ops/jpeg_size.py): the actual
entropy-coded bitstream is assembled on device as big-endian u32 words via
vectorized scatter-adds — every symbol's bit offset comes from prefix sums
(no sequential bit writer).  The host then:

  1. pulls the total bit count (a scalar) and only the used word prefix
     (≈ the size of the compressed file, typically 100-1000× smaller than
     the coefficient tensors);
  2. applies the 1-padding of the final byte and 0xFF byte stuffing
     (positions depend on byte values — inherently host work, numpy-cheap);
  3. wraps the container.

Standard Annex-K tables, interleaved single scan, no restart markers — the
configuration the engine's standard-table encode uses.  Byte-for-byte
equality with the C++ encoder is asserted in tests.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import tables as std_tables
from .dct import ZIGZAG
from .jpeg_size import mcu_order


def _code_arrays(bits, values, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(codes, lengths) int32 arrays indexed by symbol; length 0 = absent."""
    codes = np.zeros(size, dtype=np.int32)
    lens = np.zeros(size, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = code
            lens[values[k]] = length
            code += 1
            k += 1
        code <<= 1
    return codes, lens


@functools.lru_cache(maxsize=4)
def _std_code_arrays():
    dc_l = _code_arrays(std_tables.DC_LUMA_BITS, std_tables.DC_LUMA_VALS, 16)
    ac_l = _code_arrays(std_tables.AC_LUMA_BITS, std_tables.AC_LUMA_VALS,
                        256)
    dc_c = _code_arrays(std_tables.DC_CHROMA_BITS,
                        std_tables.DC_CHROMA_VALS, 16)
    ac_c = _code_arrays(std_tables.AC_CHROMA_BITS,
                        std_tables.AC_CHROMA_VALS, 256)
    return dc_l, ac_l, dc_c, ac_c


@functools.lru_cache(maxsize=64)
def _scan_layout(padded_h: int, padded_w: int, subsample: bool):
    """Static layout: per component, (mcu_order, inverse mcu_order,
    raster→scan-slot) index arrays, plus the total block count."""
    by, bx = padded_h // 8, padded_w // 8
    if subsample:
        cby, cbx = padded_h // 16, padded_w // 16
        y_order = mcu_order(bx, by, 2, 2)
        blocks_per_mcu = [4, 1, 1]
    else:
        cby, cbx = by, bx
        y_order = mcu_order(bx, by, 1, 1)
        blocks_per_mcu = [1, 1, 1]
    c_order = mcu_order(cbx, cby, 1, 1)
    n_y = bx * by
    n_c = cbx * cby
    total = n_y + 2 * n_c
    n_mcus = total // sum(blocks_per_mcu)

    # Component k-th MCU-traversal block → global scan slot.
    slots = [np.empty(n_y, np.int64), np.empty(n_c, np.int64),
             np.empty(n_c, np.int64)]
    ks = [0, 0, 0]
    g = 0
    for _ in range(n_mcus):
        for ci, nb in enumerate(blocks_per_mcu):
            for _ in range(nb):
                slots[ci][ks[ci]] = g
                ks[ci] += 1
                g += 1

    out = []
    for order, slot_by_k, n in ((y_order, slots[0], n_y),
                                (c_order, slots[1], n_c),
                                (c_order, slots[2], n_c)):
        inv = np.empty(n, np.int64)  # raster idx → MCU-traversal k
        inv[order] = np.arange(n)
        raster_slot = slot_by_k[inv]  # raster idx → global scan slot
        out.append((order.astype(np.int32), inv.astype(np.int32),
                    raster_slot.astype(np.int32)))
    return out, total


def _bitlen(v: jax.Array) -> jax.Array:
    a = jnp.abs(v).astype(jnp.int32)
    bits = jnp.zeros_like(a)
    x = a
    for _ in range(12):
        bits = bits + (x > 0).astype(jnp.int32)
        x = x >> 1
    return bits


def _component_fields(blocks: jax.Array, order: np.ndarray,
                      inv_order: np.ndarray, dc_tbl, ac_tbl):
    """Per-block/position emission fields for one component.

    blocks: (N, 64) natural-order raster.  Everything is raster-indexed;
    DC diffs computed along the MCU chain and mapped back.
    """
    dc_codes_np, dc_lens_np = dc_tbl
    ac_codes_np, ac_lens_np = ac_tbl
    dc_codes = jnp.asarray(dc_codes_np)
    dc_lens = jnp.asarray(dc_lens_np)
    ac_codes = jnp.asarray(ac_codes_np)
    ac_lens = jnp.asarray(ac_lens_np)

    zz = blocks.astype(jnp.int32)[:, ZIGZAG]
    n = zz.shape[0]
    idx = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32), (n, 64))

    dc = zz[:, 0]
    dc_mcu = dc[jnp.asarray(order)]
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), dc_mcu[:-1]])
    diff = (dc_mcu - prev)[jnp.asarray(inv_order)]  # back to raster order
    s_dc = _bitlen(diff)
    dc_code = dc_codes[s_dc]
    dc_clen = dc_lens[s_dc]
    dc_val = jnp.where(diff >= 0, diff, diff + (1 << s_dc) - 1)
    dc_bits = dc_clen + s_dc

    nz = zz != 0
    nz_marked = nz.at[:, 0].set(True)
    marked_idx = jnp.where(nz_marked, idx, 0)
    prev_nz = jax.lax.associative_scan(jnp.maximum, marked_idx, axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), prev_nz[:, :-1]], axis=1)
    gap = idx - prev_nz - 1
    s_ac = _bitlen(zz)
    zrl = jnp.clip(gap // 16, 0, 3)
    rem = gap - zrl * 16
    sym = rem * 16 + s_ac
    ac_code = ac_codes[sym]
    ac_clen = ac_lens[sym]
    ac_val = jnp.where(zz >= 0, zz, zz + (1 << s_ac) - 1)
    ac_nz = nz.at[:, 0].set(False)

    zrl_code = int(ac_codes_np[0xF0])
    zrl_len = int(ac_lens_np[0xF0])
    eob_code = int(ac_codes_np[0x00])
    eob_clen = int(ac_lens_np[0x00])

    contrib = jnp.where(ac_nz, zrl * zrl_len + ac_clen + s_ac, 0)
    has_eob = zz[:, 63] == 0
    eob_len = jnp.where(has_eob, eob_clen, 0)
    block_bits = dc_bits + jnp.sum(contrib, axis=1) + eob_len
    pos_start = dc_bits[:, None] + jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         jnp.cumsum(contrib, axis=1)[:, :-1]], axis=1)
    eob_off = block_bits - eob_len

    return {
        "dc_code": dc_code, "dc_clen": dc_clen, "dc_val": dc_val,
        "s_dc": s_dc, "block_bits": block_bits,
        "ac_code": ac_code, "ac_clen": ac_clen, "ac_val": ac_val,
        "s_ac": s_ac, "ac_nz": ac_nz, "zrl": zrl,
        "zrl_code": zrl_code, "zrl_len": zrl_len,
        "pos_start": pos_start, "has_eob": has_eob, "eob_off": eob_off,
        "eob_code": eob_code, "eob_clen": eob_clen,
    }


def _deposit(words: jax.Array, value, length, offset, mask) -> jax.Array:
    """Scatter-add big-endian bit fields into a (W,) uint32 array.

    value/length/offset: int32 arrays (any shape, flattened); fields never
    exceed 26 bits so they straddle at most two words.  Non-overlapping by
    construction, so add is exact.
    """
    v = jnp.where(mask, value, 0).astype(jnp.uint32).ravel()
    ln = jnp.where(mask, length, 0).ravel()
    off = jnp.asarray(offset).ravel()
    m = jnp.asarray(mask).ravel()
    word = off // 32
    bit = off % 32
    shift = 32 - bit - ln
    hi = jnp.where(shift >= 0,
                   v << jnp.clip(shift, 0, 31).astype(jnp.uint32),
                   v >> jnp.clip(-shift, 0, 31).astype(jnp.uint32))
    lo = (v << jnp.clip(32 + shift, 0, 31).astype(jnp.uint32))
    words = words.at[word].add(jnp.where(m, hi, 0), mode="drop")
    words = words.at[word + 1].add(
        jnp.where(m & (shift < 0), lo, 0), mode="drop")
    return words


def emit_scan_device(qy: jax.Array, qcb: jax.Array, qcr: jax.Array,
                     padded_h: int, padded_w: int, subsample: bool,
                     max_words: int):
    """Assemble the entropy-coded scan on device.

    Inputs: (N, 64) quantized blocks per component (natural order raster,
    any numeric dtype).  Returns (words uint32 (max_words,), total_bits
    int32).  Caller must size max_words generously (bits never exceed
    26 per coefficient plus per-block overhead; scan_bits_device gives the
    exact count if needed).
    """
    dc_l, ac_l, dc_c, ac_c = _std_code_arrays()
    layout, total = _scan_layout(padded_h, padded_w, subsample)

    comps = []
    for blocks, (order, inv, raster_slot), dct, act in (
            (qy, layout[0], dc_l, ac_l),
            (qcb, layout[1], dc_c, ac_c),
            (qcr, layout[2], dc_c, ac_c)):
        fields = _component_fields(blocks, order, inv, dct, act)
        comps.append((fields, raster_slot))

    scan_bits = jnp.zeros(total, dtype=jnp.int32)
    for fields, raster_slot in comps:
        scan_bits = scan_bits.at[jnp.asarray(raster_slot)].set(
            fields["block_bits"])
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(scan_bits)[:-1]])
    total_bits = jnp.sum(scan_bits)

    words = jnp.zeros(max_words, dtype=jnp.uint32)
    for fields, raster_slot in comps:
        blk_start = starts[jnp.asarray(raster_slot)]  # (N,) raster order
        ones = jnp.ones_like(blk_start, dtype=bool)
        words = _deposit(words, fields["dc_code"], fields["dc_clen"],
                         blk_start, ones)
        words = _deposit(words, fields["dc_val"], fields["s_dc"],
                         blk_start + fields["dc_clen"],
                         fields["s_dc"] > 0)
        pos_off = blk_start[:, None] + fields["pos_start"]
        nz = fields["ac_nz"]
        zl = fields["zrl_len"]
        for k in range(3):
            m = nz & (fields["zrl"] > k)
            words = _deposit(
                words,
                jnp.full(nz.shape, fields["zrl_code"], jnp.int32),
                jnp.full(nz.shape, zl, jnp.int32),
                pos_off + k * zl, m)
        sym_off = pos_off + fields["zrl"] * zl
        words = _deposit(words, fields["ac_code"], fields["ac_clen"],
                         sym_off, nz)
        words = _deposit(words, fields["ac_val"], fields["s_ac"],
                         sym_off + fields["ac_clen"],
                         nz & (fields["s_ac"] > 0))
        words = _deposit(
            words,
            jnp.full(blk_start.shape, fields["eob_code"], jnp.int32),
            jnp.full(blk_start.shape, fields["eob_clen"], jnp.int32),
            blk_start + fields["eob_off"], fields["has_eob"])

    return words, total_bits


def finalize_scan_host(words: np.ndarray, total_bits: int) -> bytes:
    """1-pad the final byte, trim, and 0xFF-stuff — pure numpy."""
    nbytes = (int(total_bits) + 7) // 8
    raw = np.ascontiguousarray(words).astype(">u4").tobytes()[:nbytes]
    buf = bytearray(raw)
    rem = int(total_bits) % 8
    if rem:
        buf[-1] |= (1 << (8 - rem)) - 1
    arr = np.frombuffer(bytes(buf), dtype=np.uint8)
    ff = np.nonzero(arr == 0xFF)[0]
    if ff.size:
        arr = np.insert(arr, ff + 1, np.uint8(0))
    return arr.tobytes()
