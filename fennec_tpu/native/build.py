"""Build and load the native C++ runtime library (_fennec_native.so).

Compiled on demand with g++ -O3 and cached next to the source; rebuilds
when the source is newer than the shared object.  `python -m
fennec_tpu.native.build` forces a rebuild.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "entropy.cpp")
_SO = os.path.join(_HERE, "_fennec_native.so")


def compile_library(force: bool = False) -> str:
    if not force and os.path.exists(_SO):
        # A deployment may ship the .so without the C++ source; a missing
        # source must not disable a valid prebuilt library.
        if not os.path.exists(_SRC) \
                or os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
    # mkstemp (not mktemp): concurrent importers must not race on one
    # temp path and install a truncated .so.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-fno-exceptions", "-o", tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _SO


class NativeLib:
    """ctypes façade matching the fennec_tpu.native dispatch interfaces."""

    def __init__(self, path: str):
        self._lib = ctypes.CDLL(path)
        lib = self._lib
        lib.fennec_jpeg_encode_scan.restype = ctypes.c_long
        lib.fennec_jpeg_encode_scan.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.fennec_jpeg_decode_scan.restype = ctypes.c_long
        lib.fennec_jpeg_decode_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.fennec_jpeg_count_symbols.restype = ctypes.c_long
        lib.fennec_jpeg_count_symbols.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.fennec_jpeg_encode_scan_custom.restype = ctypes.c_long
        lib.fennec_jpeg_encode_scan_custom.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.fennec_jpeg_decode_scan_i8.restype = ctypes.c_long
        lib.fennec_jpeg_decode_scan_i8.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fennec_jpeg_decode_scan_coo.restype = ctypes.c_long
        lib.fennec_jpeg_decode_scan_coo.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fennec_jpeg_decode_progressive_scan.restype = ctypes.c_long
        lib.fennec_jpeg_decode_progressive_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fennec_int16_to_int8_exc.restype = ctypes.c_long
        lib.fennec_int16_to_int8_exc.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.fennec_build_optimal_specs.restype = ctypes.c_long
        lib.fennec_build_optimal_specs.argtypes = [
            ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.fennec_png_unfilter.restype = ctypes.c_int
        lib.fennec_png_unfilter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.fennec_png_filter.restype = ctypes.c_long
        lib.fennec_png_filter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.fennec_rgb_to_yuv420.restype = ctypes.c_int
        lib.fennec_rgb_to_yuv420.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        try:  # prebuilt .so shipped without source may predate this
            lib.fennec_rgba_to_yuv420_one.restype = ctypes.c_int
            lib.fennec_rgba_to_yuv420_one.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p,
            ]
        except AttributeError:
            pass

    # ── JPEG ────────────────────────────────────────────────────────────

    @staticmethod
    def _comp_geometry(comps):
        n = len(comps)
        arrays = [np.ascontiguousarray(c.qcoefs, dtype=np.int32)
                  for c in comps]
        ptrs = (ctypes.c_void_p * n)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays])
        bw = (ctypes.c_int * n)(*[c.bw for c in comps])
        bh = (ctypes.c_int * n)(*[c.bh for c in comps])
        hs = (ctypes.c_int * n)(*[c.h for c in comps])
        vs = (ctypes.c_int * n)(*[c.v for c in comps])
        chroma = (ctypes.c_int * n)(
            *[1 if getattr(c, "chroma", False) else 0 for c in comps])
        return n, arrays, ptrs, bw, bh, hs, vs, chroma

    def count_symbols(self, comps, restart_interval: int = 0):
        n, arrays, ptrs, bw, bh, hs, vs, chroma = self._comp_geometry(comps)
        dc_freq = np.zeros((2, 16), dtype=np.int64)
        ac_freq = np.zeros((2, 256), dtype=np.int64)
        rc = self._lib.fennec_jpeg_count_symbols(
            n, ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            bw, bh, hs, vs, chroma, restart_interval,
            dc_freq.ctypes.data_as(ctypes.c_void_p),
            ac_freq.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError("fennec native: count_symbols failed")
        return dc_freq, ac_freq

    def build_optimal_specs(self, dc_freq: np.ndarray,
                            ac_freq: np.ndarray):
        """Batch T.81 K.2 optimal-table construction.

        dc_freq (B, 2, 16) / ac_freq (B, 2, 256) int64 → (bits (B, 4, 16)
        u8, vals (B, 4, 256) u8, nvals (B, 4) i32); table order per image
        is dc-luma, dc-chroma, ac-luma, ac-chroma."""
        dcf = np.ascontiguousarray(dc_freq, dtype=np.int64)
        acf = np.ascontiguousarray(ac_freq, dtype=np.int64)
        b = dcf.shape[0]
        bits = np.zeros((b, 4, 16), dtype=np.uint8)
        vals = np.zeros((b, 4, 256), dtype=np.uint8)
        nvals = np.zeros((b, 4), dtype=np.int32)
        rc = self._lib.fennec_build_optimal_specs(
            b, dcf.ctypes.data_as(ctypes.c_void_p),
            acf.ctypes.data_as(ctypes.c_void_p),
            bits.ctypes.data_as(ctypes.c_void_p),
            vals.ctypes.data_as(ctypes.c_void_p),
            nvals.ctypes.data_as(ctypes.c_void_p))
        if rc == 2:
            # Same condition and message as the Python builder
            # (huffopt.optimal_spec) so both paths fail identically.
            raise ValueError(
                "fennec: optimal Huffman code length exceeds 32 bits")
        if rc != 0:
            raise RuntimeError("fennec native: build_optimal_specs failed")
        return bits, vals, nvals

    def encode_scan_custom(self, comps, dc_specs, ac_specs,
                           restart_interval: int = 0) -> bytes:
        n, arrays, ptrs, bw, bh, hs, vs, chroma = self._comp_geometry(comps)
        dc_bits = b"".join(bytes(s[0]) for s in dc_specs)
        ac_bits = b"".join(bytes(s[0]) for s in ac_specs)
        dc_vals = b"".join(bytes(s[1]) for s in dc_specs)
        ac_vals = b"".join(bytes(s[1]) for s in ac_specs)
        dc_nvals = (ctypes.c_int * 2)(*[len(s[1]) for s in dc_specs])
        ac_nvals = (ctypes.c_int * 2)(*[len(s[1]) for s in ac_specs])
        total_blocks = sum(a.shape[0] for a in arrays)
        cap = total_blocks * 64 * 4 + 65536
        out = ctypes.create_string_buffer(cap)
        written = self._lib.fennec_jpeg_encode_scan_custom(
            n, ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            bw, bh, hs, vs, chroma, restart_interval,
            dc_bits, dc_vals, dc_nvals, ac_bits, ac_vals, ac_nvals,
            out, cap)
        if written < 0:
            raise RuntimeError("fennec native: encode_scan_custom failed")
        return out.raw[:written]

    def encode_scan(self, comps, restart_interval: int = 0) -> bytes:
        n, arrays, ptrs, bw, bh, hs, vs, chroma = \
            self._comp_geometry(comps)
        total_blocks = sum(a.shape[0] for a in arrays)
        cap = total_blocks * 64 * 4 + 65536
        out = ctypes.create_string_buffer(cap)
        written = self._lib.fennec_jpeg_encode_scan(
            n, ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            bw, bh, hs, vs, chroma, restart_interval, out, cap)
        if written < 0:
            raise RuntimeError("fennec native: encode_scan failed")
        return out.raw[:written]

    def decode_scan(self, data: bytes, pos: int, comps,
                    restart_interval: int = 0) -> List[np.ndarray]:
        n = len(comps)
        outs = [np.zeros((c.bw * c.bh, 64), dtype=np.int16) for c in comps]
        out_ptrs = (ctypes.c_void_p * n)(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
        bw = (ctypes.c_int * n)(*[c.bw for c in comps])
        bh = (ctypes.c_int * n)(*[c.bh for c in comps])
        hs = (ctypes.c_int * n)(*[c.h for c in comps])
        vs = (ctypes.c_int * n)(*[c.v for c in comps])

        dc_bits = b"".join(bytes(c.dc_spec[0]) for c in comps)
        ac_bits = b"".join(bytes(c.ac_spec[0]) for c in comps)
        dc_vals_list = [bytes(c.dc_spec[1]) for c in comps]
        ac_vals_list = [bytes(c.ac_spec[1]) for c in comps]
        dc_vals = b"".join(dc_vals_list)
        ac_vals = b"".join(ac_vals_list)
        dc_nvals = (ctypes.c_int * n)(*[len(v) for v in dc_vals_list])
        ac_nvals = (ctypes.c_int * n)(*[len(v) for v in ac_vals_list])
        dc_voff, ac_voff = [], []
        off = 0
        for v in dc_vals_list:
            dc_voff.append(off)
            off += len(v)
        off = 0
        for v in ac_vals_list:
            ac_voff.append(off)
            off += len(v)
        dc_voff = (ctypes.c_int * n)(*dc_voff)
        ac_voff = (ctypes.c_int * n)(*ac_voff)

        rc = self._lib.fennec_jpeg_decode_scan(
            data, len(data), pos, n,
            ctypes.cast(out_ptrs, ctypes.POINTER(ctypes.c_void_p)),
            bw, bh, hs, vs,
            dc_bits, dc_vals, dc_nvals, dc_voff,
            ac_bits, ac_vals, ac_nvals, ac_voff,
            restart_interval)
        if rc < 0:
            raise ValueError("fennec native: corrupt JPEG scan")
        return outs

    def decode_scan_i8(self, data: bytes, pos: int, comps,
                       restart_interval: int, out_i8: np.ndarray,
                       flat_base: int, max_exc: int = 16384):
        """Decode an interleaved scan straight into int8 ZIGZAG-order
        blocks + sparse |v|>127 exceptions (absolute indices offset by
        flat_base).  out_i8: flat int8 view covering sum(bw*bh)*64
        entries.  Returns (exc_idx int32, exc_val int16, max_zigzag
        extent).  Raises ValueError on corrupt data, OverflowError when
        exceptions exceed max_exc."""
        n = len(comps)
        if out_i8.dtype != np.int8 or not out_i8.flags.c_contiguous:
            # Hard precondition before raw pointers reach C; assert would
            # vanish under python -O.
            raise ValueError("fennec: out_i8 must be contiguous int8")
        bw = (ctypes.c_int * n)(*[c.bw for c in comps])
        bh = (ctypes.c_int * n)(*[c.bh for c in comps])
        hs = (ctypes.c_int * n)(*[c.h for c in comps])
        vs = (ctypes.c_int * n)(*[c.v for c in comps])
        dc_bits = b"".join(bytes(c.dc_spec[0]) for c in comps)
        ac_bits = b"".join(bytes(c.ac_spec[0]) for c in comps)
        dc_vals_list = [bytes(c.dc_spec[1]) for c in comps]
        ac_vals_list = [bytes(c.ac_spec[1]) for c in comps]
        dc_vals = b"".join(dc_vals_list)
        ac_vals = b"".join(ac_vals_list)
        dc_nvals = (ctypes.c_int * n)(*[len(v) for v in dc_vals_list])
        ac_nvals = (ctypes.c_int * n)(*[len(v) for v in ac_vals_list])
        offs = []
        off = 0
        for v in dc_vals_list:
            offs.append(off)
            off += len(v)
        dc_voff = (ctypes.c_int * n)(*offs)
        offs = []
        off = 0
        for v in ac_vals_list:
            offs.append(off)
            off += len(v)
        ac_voff = (ctypes.c_int * n)(*offs)
        exc_idx = np.empty(max_exc, dtype=np.int32)
        exc_val = np.empty(max_exc, dtype=np.int16)
        maxk = ctypes.c_int32(64)
        ne = self._lib.fennec_jpeg_decode_scan_i8(
            data, len(data), pos, n,
            out_i8.ctypes.data_as(ctypes.c_void_p),
            bw, bh, hs, vs,
            dc_bits, dc_vals, dc_nvals, dc_voff,
            ac_bits, ac_vals, ac_nvals, ac_voff,
            restart_interval, flat_base,
            exc_idx.ctypes.data_as(ctypes.c_void_p),
            exc_val.ctypes.data_as(ctypes.c_void_p), max_exc,
            ctypes.byref(maxk))
        if ne == -1:
            raise ValueError("fennec native: corrupt JPEG scan")
        if ne == -2:
            raise OverflowError("fennec native: too many int8 exceptions")
        return exc_idx[:ne].copy(), exc_val[:ne].copy(), int(maxk.value)

    def decode_scan_coo(self, data: bytes, pos: int, comps,
                        restart_interval: int, out_dc: np.ndarray,
                        out_pos: np.ndarray, out_val: np.ndarray,
                        rcap: int, max_exc: int = 16384):
        """Decode an interleaved scan straight into the sparse COO
        upload layout: out_dc (NT,) int8, out_pos/out_val (NT, rcap)
        uint8/int8 zigzag (position, value) AC-nonzero pairs; |v|>127
        and slot overflow spill to the exception list (image-local
        offsets into the NT*64 zigzag layout).  Returns (exc_idx,
        exc_val, cnt_hist (65,) int32, max_zigzag_extent)."""
        n = len(comps)
        if out_dc.dtype != np.int8 or not out_dc.flags.c_contiguous \
                or out_pos.dtype != np.uint8 \
                or not out_pos.flags.c_contiguous \
                or out_val.dtype != np.int8 \
                or not out_val.flags.c_contiguous:
            raise ValueError("fennec: COO outputs must be contiguous "
                             "int8/uint8/int8")
        bw = (ctypes.c_int * n)(*[c.bw for c in comps])
        bh = (ctypes.c_int * n)(*[c.bh for c in comps])
        hs = (ctypes.c_int * n)(*[c.h for c in comps])
        vs = (ctypes.c_int * n)(*[c.v for c in comps])
        dc_bits = b"".join(bytes(c.dc_spec[0]) for c in comps)
        ac_bits = b"".join(bytes(c.ac_spec[0]) for c in comps)
        dc_vals_list = [bytes(c.dc_spec[1]) for c in comps]
        ac_vals_list = [bytes(c.ac_spec[1]) for c in comps]
        dc_vals = b"".join(dc_vals_list)
        ac_vals = b"".join(ac_vals_list)
        dc_nvals = (ctypes.c_int * n)(*[len(v) for v in dc_vals_list])
        ac_nvals = (ctypes.c_int * n)(*[len(v) for v in ac_vals_list])
        offs = []
        off = 0
        for v in dc_vals_list:
            offs.append(off)
            off += len(v)
        dc_voff = (ctypes.c_int * n)(*offs)
        offs = []
        off = 0
        for v in ac_vals_list:
            offs.append(off)
            off += len(v)
        ac_voff = (ctypes.c_int * n)(*offs)
        exc_idx = np.empty(max_exc, dtype=np.int32)
        exc_val = np.empty(max_exc, dtype=np.int16)
        cnt_hist = np.zeros(65, dtype=np.int32)
        maxk = ctypes.c_int32(64)
        ne = self._lib.fennec_jpeg_decode_scan_coo(
            data, len(data), pos, n,
            out_dc.ctypes.data_as(ctypes.c_void_p),
            out_pos.ctypes.data_as(ctypes.c_void_p),
            out_val.ctypes.data_as(ctypes.c_void_p), rcap,
            bw, bh, hs, vs,
            dc_bits, dc_vals, dc_nvals, dc_voff,
            ac_bits, ac_vals, ac_nvals, ac_voff,
            restart_interval,
            exc_idx.ctypes.data_as(ctypes.c_void_p),
            exc_val.ctypes.data_as(ctypes.c_void_p), max_exc,
            cnt_hist.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(maxk))
        if ne == -1:
            raise ValueError("fennec native: corrupt JPEG scan")
        if ne == -2:
            raise OverflowError("fennec native: too many COO exceptions")
        return (exc_idx[:ne].copy(), exc_val[:ne].copy(), cnt_hist,
                int(maxk.value))

    def decode_progressive_scan(self, data: bytes, pos: int,
                                coefs: List[np.ndarray],
                                bw: List[int], hs: List[int], vs: List[int],
                                mcus_x: int, mcus_y: int,
                                nbw: List[int], nbh: List[int],
                                ss: int, se: int, ah: int, al: int,
                                dc_specs, ac_spec,
                                restart_interval: int) -> int:
        """Apply one progressive scan in place to the per-scan-component
        int32 coefficient arrays.  Returns the byte offset past the scan.
        Raises ValueError on corrupt data WITHOUT modifying `coefs` (a
        snapshot is restored), so callers can retry with the Python path."""
        n = len(coefs)
        for c in coefs:
            if c.dtype != np.int32 or not c.flags.c_contiguous:
                raise ValueError(
                    "fennec: coefs must be contiguous int32")
        ptrs = (ctypes.c_void_p * n)(
            *[c.ctypes.data_as(ctypes.c_void_p).value for c in coefs])
        bw_a = (ctypes.c_int * n)(*bw)
        hs_a = (ctypes.c_int * n)(*hs)
        vs_a = (ctypes.c_int * n)(*vs)
        nbw_a = (ctypes.c_int * n)(*nbw)
        nbh_a = (ctypes.c_int * n)(*nbh)
        if ss == 0 and ah == 0:
            dc_bits = b"".join(bytes(s[0]) for s in dc_specs)
            dc_vals_list = [bytes(s[1]) for s in dc_specs]
            dc_vals = b"".join(dc_vals_list)
            dc_nvals = (ctypes.c_int * n)(*[len(v) for v in dc_vals_list])
            offs, off = [], 0
            for v in dc_vals_list:
                offs.append(off)
                off += len(v)
            dc_voff = (ctypes.c_int * n)(*offs)
        else:
            dc_bits = bytes(16 * n)
            dc_vals = b""
            dc_nvals = (ctypes.c_int * n)(*([0] * n))
            dc_voff = (ctypes.c_int * n)(*([0] * n))
        if ss > 0:
            ac_bits = bytes(ac_spec[0])
            ac_vals = bytes(ac_spec[1])
        else:
            ac_bits, ac_vals = bytes(16), b""

        snapshot = [c.copy() for c in coefs]
        rc = self._lib.fennec_jpeg_decode_progressive_scan(
            data, len(data), pos, n,
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            bw_a, hs_a, vs_a, mcus_x, mcus_y, nbw_a, nbh_a,
            ss, se, ah, al,
            dc_bits, dc_vals, dc_nvals, dc_voff,
            ac_bits, ac_vals, len(ac_vals), restart_interval)
        if rc < 0:
            for c, snap in zip(coefs, snapshot):
                np.copyto(c, snap)
            raise ValueError("fennec native: corrupt progressive scan")
        return int(rc)

    def int16_to_int8_exc(self, arr: np.ndarray):
        """Clip int16 → int8 with an exception list for |v| > 127.
        Returns (int8 array same shape, exc_idx int32, exc_val int16)."""
        flat = np.ascontiguousarray(arr, dtype=np.int16).ravel()
        out = np.empty(flat.shape, dtype=np.int8)
        max_exc = max(1024, flat.size // 16)
        exc_idx = np.empty(max_exc, dtype=np.int32)
        exc_val = np.empty(max_exc, dtype=np.int16)
        ne = self._lib.fennec_int16_to_int8_exc(
            flat.ctypes.data_as(ctypes.c_void_p), flat.size,
            out.ctypes.data_as(ctypes.c_void_p),
            exc_idx.ctypes.data_as(ctypes.c_void_p),
            exc_val.ctypes.data_as(ctypes.c_void_p), max_exc)
        if ne < 0:
            raise ValueError("fennec native: too many int8 exceptions")
        return (out.reshape(arr.shape), exc_idx[:ne].copy(),
                exc_val[:ne].copy())

    # ── PNG ─────────────────────────────────────────────────────────────

    def png_unfilter(self, raw: bytes, height: int, stride: int,
                     bpp: int) -> np.ndarray:
        out = np.zeros((height, stride), dtype=np.uint8)
        rc = self._lib.fennec_png_unfilter(
            raw, height, stride, bpp,
            out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise ValueError("fennec native: bad PNG filter type")
        return out

    def rgb_to_yuv420(self, rgb: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 RGB → the flat YCbCr 4:2:0 wire buffer
        (engine/batched._yuv420_wire_host layout)."""
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        b, h, w, _ = rgb.shape
        ph, pw = h + (-h) % 16, w + (-w) % 16
        out = np.empty((b, ph * pw + 2 * (ph // 2) * (pw // 2)),
                       np.uint8)
        rc = self._lib.fennec_rgb_to_yuv420(
            rgb.ctypes.data_as(ctypes.c_void_p), b, h, w,
            out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError("fennec native: rgb_to_yuv420 failed")
        return out

    def rgba_to_yuv420_into(self, img: np.ndarray,
                            out_row: np.ndarray) -> None:
        """ONE (H, W, C≥3) uint8 image (any C-contiguous row layout with
        pixel stride 3 or 4 — an NRGBA array or a [..., :3] view of one)
        → its flat YCbCr 4:2:0 wire row, written in place.  Skips the
        packed-RGB staging copy the batch entry needs."""
        h, w = img.shape[:2]
        ps = img.strides[1]
        if (img.dtype != np.uint8 or ps not in (3, 4)
                or img.strides[2] != 1 or img.strides[0] != w * ps):
            # Non-trivial layout: fall back through a contiguous copy.
            img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
            ps = 3
        if not hasattr(self._lib, "fennec_rgba_to_yuv420_one"):
            raise RuntimeError("fennec native: library predates "
                               "rgba_to_yuv420_one")
        rc = self._lib.fennec_rgba_to_yuv420_one(
            img.ctypes.data_as(ctypes.c_void_p), h, w, ps,
            out_row.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError("fennec native: rgba_to_yuv420 failed")

    def png_filter(self, data: np.ndarray, bpp: int,
                   heuristic: bool = True) -> bytes:
        data = np.ascontiguousarray(data, dtype=np.uint8)
        h, stride = data.shape
        out = ctypes.create_string_buffer(h * (stride + 1))
        written = self._lib.fennec_png_filter(
            data.ctypes.data_as(ctypes.c_void_p), h, stride, bpp,
            1 if heuristic else 0, out)
        if written < 0:
            raise RuntimeError("fennec native: png_filter failed")
        return out.raw[:written]


def load() -> NativeLib:
    return NativeLib(compile_library())


if __name__ == "__main__":
    path = compile_library(force=True)
    print(f"built {path}")
