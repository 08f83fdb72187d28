"""Pure-Python JPEG entropy (Huffman) coder — reference/fallback path.

The production path is the C++ codec in fennec_tpu/native (same interface);
this module is the always-available fallback and the correctness oracle the
native code is tested against.  Only the *final* winning quality is entropy
coded in the standard pipeline (the quality search itself runs entirely on
device — see engine/compress.py), so this Python path is off the hot loop.

Bitstream semantics: ITU T.81 baseline sequential — DC prediction per
component, run/size AC coding, EOB/ZRL, 0xFF byte stuffing, RSTn markers.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.dct import ZIGZAG
from . import tables as std_tables


# ── Huffman table construction ──────────────────────────────────────────────


def build_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol → (code, length) from the (BITS, HUFFVAL) spec (T.81 C.2)."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_decode_table(bits: List[int], values: List[int]):
    """(maxcode, valptr, mincode, values) arrays for canonical decoding."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1] > 0:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    return mincode, maxcode, valptr, list(values)


# ── Bit I/O ─────────────────────────────────────────────────────────────────


class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits > 0:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def emit_marker(self, marker: int) -> None:
        self.flush()
        self.out.append(0xFF)
        self.out.append(marker)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker_hit: Optional[int] = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # A real marker: stop feeding bits.
                self.marker_hit = nxt
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        return self.read_bits(1)

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> Optional[int]:
        """Discard buffered bits and consume an RSTn marker if present."""
        self.acc = 0
        self.nbits = 0
        self.marker_hit = None
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                if self.data[self.pos + 1] == 0xFF:
                    self.pos += 1  # legal fill byte (T.81 B.1.1.2)
                    continue
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


# ── Scan encoding ───────────────────────────────────────────────────────────


def _magnitude_bits(v: int) -> Tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


@functools.lru_cache(maxsize=4)
def _std_codes(chroma: bool):
    if chroma:
        return (build_codes(std_tables.DC_CHROMA_BITS,
                            std_tables.DC_CHROMA_VALS),
                build_codes(std_tables.AC_CHROMA_BITS,
                            std_tables.AC_CHROMA_VALS))
    return (build_codes(std_tables.DC_LUMA_BITS,
                        std_tables.DC_LUMA_VALS),
            build_codes(std_tables.AC_LUMA_BITS,
                        std_tables.AC_LUMA_VALS))


class ComponentSpec:
    """One scan component to encode: quantized coefficients + geometry.

    Encoding always uses the standard Annex K tables; `chroma` selects the
    luma or chroma pair.
    """

    def __init__(self, qcoefs: np.ndarray, blocks_w: int, blocks_h: int,
                 h: int, v: int, chroma: bool = False, codes=None):
        self.qcoefs = qcoefs  # (nblocks, 64) int, natural order, raster
        self.bw = blocks_w
        self.bh = blocks_h
        self.h = h
        self.v = v
        self.chroma = chroma
        if codes is not None:
            self.dc_codes, self.ac_codes = codes
        else:
            self.dc_codes, self.ac_codes = _std_codes(chroma)


def encode_scan(comps: List[ComponentSpec],
                restart_interval: int = 0) -> bytes:
    """Interleaved baseline scan body (entropy-coded data only)."""
    w = BitWriter()
    mcus_x = comps[0].bw // comps[0].h if comps[0].h else 0
    mcus_y = comps[0].bh // comps[0].v if comps[0].v else 0
    # All component grids must tile the same MCU lattice.
    for c in comps:
        assert c.bw == mcus_x * c.h and c.bh == mcus_y * c.v, \
            "component grid does not tile the MCU lattice"

    zz = ZIGZAG
    dc_pred = [0] * len(comps)
    rst_idx = 0
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count == restart_interval:
                w.emit_marker(0xD0 + (rst_idx & 7))
                rst_idx += 1
                dc_pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                for dy in range(c.v):
                    for dx in range(c.h):
                        by = my * c.v + dy
                        bx = mx * c.h + dx
                        block = c.qcoefs[by * c.bw + bx]
                        dc_pred[ci] = _encode_block(
                            w, block, zz, dc_pred[ci],
                            c.dc_codes, c.ac_codes)
            mcu_count += 1
    w.flush()
    return bytes(w.out)


def _encode_block(w: BitWriter, block: np.ndarray, zz: np.ndarray,
                  pred: int, dc_codes, ac_codes) -> int:
    dc = int(block[0])
    diff = dc - pred
    size, bits = _magnitude_bits(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)

    run = 0
    for i in range(1, 64):
        v = int(block[zz[i]])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude_bits(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if run > 0:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def count_symbols(comps: List[ComponentSpec],
                  restart_interval: int = 0):
    """Tally DC-size and AC-RS symbol frequencies per table class.

    Returns ((2, 16), (2, 256)) int64 arrays [luma, chroma] — input to the
    optimal Huffman construction (codecs/huffopt.py).
    """
    dc_freq = np.zeros((2, 16), dtype=np.int64)
    ac_freq = np.zeros((2, 256), dtype=np.int64)
    mcus_x = comps[0].bw // comps[0].h
    mcus_y = comps[0].bh // comps[0].v
    zz = ZIGZAG
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count == restart_interval:
                dc_pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                cls = 1 if c.chroma else 0
                for dy in range(c.v):
                    for dx in range(c.h):
                        by = my * c.v + dy
                        bx = mx * c.h + dx
                        block = c.qcoefs[by * c.bw + bx]
                        dc = int(block[0])
                        size, _ = _magnitude_bits(dc - dc_pred[ci])
                        dc_pred[ci] = dc
                        dc_freq[cls, size] += 1
                        run = 0
                        for i in range(1, 64):
                            v = int(block[zz[i]])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                ac_freq[cls, 0xF0] += 1
                                run -= 16
                            s, _ = _magnitude_bits(v)
                            ac_freq[cls, (run << 4) | s] += 1
                            run = 0
                        if run > 0:
                            ac_freq[cls, 0x00] += 1
            mcu_count += 1
    return dc_freq, ac_freq


# ── Scan decoding ───────────────────────────────────────────────────────────


class DecodeComponentSpec:
    """One scan component to decode: geometry + raw Huffman (BITS, VALS)
    specs as parsed from DHT segments."""

    def __init__(self, blocks_w: int, blocks_h: int, h: int, v: int,
                 dc_spec: Tuple[list, list], ac_spec: Tuple[list, list]):
        self.bw = blocks_w
        self.bh = blocks_h
        self.h = h
        self.v = v
        self.dc_spec = dc_spec
        self.ac_spec = ac_spec
        self.dc_table = build_decode_table(*dc_spec)
        self.ac_table = build_decode_table(*ac_spec)


def _decode_huffman(r: BitReader, table) -> int:
    mincode, maxcode, valptr, values = table
    code = r.read_bit()
    for length in range(1, 17):
        if maxcode[length] >= 0 and code <= maxcode[length]:
            return values[valptr[length] + code - mincode[length]]
        code = (code << 1) | r.read_bit()
    raise ValueError("fennec: corrupt JPEG: bad Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_scan(data: bytes, pos: int, comps: List[DecodeComponentSpec],
                restart_interval: int = 0) -> Tuple[List[np.ndarray], int]:
    """Decode an interleaved baseline scan starting at byte offset pos.

    Returns per-component (nblocks, 64) int16 arrays in natural order and
    the byte offset just past the scan data.
    """
    r = BitReader(data, pos)
    mcus_x = comps[0].bw // comps[0].h
    mcus_y = comps[0].bh // comps[0].v
    out = [np.zeros((c.bw * c.bh, 64), dtype=np.int16) for c in comps]
    dc_pred = [0] * len(comps)
    zz = ZIGZAG
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count == restart_interval:
                m = r.align_to_marker()
                if m is not None and not (0xD0 <= m <= 0xD7):
                    raise ValueError("fennec: corrupt JPEG: expected RST")
                dc_pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                for dy in range(c.v):
                    for dx in range(c.h):
                        by = my * c.v + dy
                        bx = mx * c.h + dx
                        block = out[ci][by * c.bw + bx]
                        # DC
                        size = _decode_huffman(r, c.dc_table)
                        diff = _extend(r.read_bits(size), size)
                        dc_pred[ci] += diff
                        block[0] = dc_pred[ci]
                        # AC
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(r, c.ac_table)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "fennec: corrupt JPEG: AC overflow")
                            block[zz[k]] = _extend(r.read_bits(size), size)
                            k += 1
            mcu_count += 1

    return out, r.pos
