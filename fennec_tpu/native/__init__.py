"""Native (C++) runtime components with pure-Python fallbacks.

The hot host-side paths — JPEG entropy coding, PNG scanline (un)filtering —
are implemented in C++ (fennec_tpu/native/*.cpp, built to _fennec_native.so
via `python -m fennec_tpu.native.build` or on first import).  Every entry
point has a pure-Python fallback so the framework works without a compiler;
the native library is the production path (the reference gets the same
effect from compiled Go; this framework's device math lives in XLA and the
byte-twiddling lives here).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, List, Optional

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from ..codecs import entropy_py

_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("FENNEC_NO_NATIVE"):
        return None
    try:
        from . import build as _build
        _lib = _build.load()
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


_DISPATCH_WARNED = False


def _dispatch_fallback(exc: Exception) -> None:
    """Note an unexpected native-path failure once.  Data errors
    (ValueError/OverflowError: corrupt scan, exception overflow) fall
    back silently by design — the Python path re-raises the precise
    error or handles the file; anything else (ctypes drift, ABI breaks)
    is an infrastructure bug being masked by a 100x slower fallback and
    must be visible."""
    global _DISPATCH_WARNED
    if isinstance(exc, (ValueError, OverflowError)):
        return
    if not _DISPATCH_WARNED:
        import sys

        print(f"fennec: native dispatch failed ({exc!r}); "
              f"falling back to the Python path", file=sys.stderr,
              flush=True)
        _DISPATCH_WARNED = True


# ── JPEG entropy coding ─────────────────────────────────────────────────────


def jpeg_encode_scan(comps: List["entropy_py.ComponentSpec"],
                     restart_interval: int = 0) -> bytes:
    from ..codecs import entropy_py
    lib = _load_native()
    if lib is not None:
        try:
            return lib.encode_scan(comps, restart_interval)
        except Exception as e:
            _dispatch_fallback(e)
    return entropy_py.encode_scan(comps, restart_interval)


def jpeg_decode_scan(data: bytes, pos: int,
                     comps: List["entropy_py.DecodeComponentSpec"],
                     restart_interval: int = 0) -> List[np.ndarray]:
    from ..codecs import entropy_py
    lib = _load_native()
    if lib is not None:
        try:
            return lib.decode_scan(data, pos, comps, restart_interval)
        except Exception as e:
            _dispatch_fallback(e)
    out, _ = entropy_py.decode_scan(data, pos, comps, restart_interval)
    return out


def jpeg_count_symbols(comps: List["entropy_py.ComponentSpec"],
                       restart_interval: int = 0):
    from ..codecs import entropy_py
    lib = _load_native()
    if lib is not None:
        try:
            return lib.count_symbols(comps, restart_interval)
        except Exception as e:
            _dispatch_fallback(e)
    return entropy_py.count_symbols(comps, restart_interval)


def jpeg_encode_scan_custom(comps: List["entropy_py.ComponentSpec"],
                            dc_specs, ac_specs,
                            restart_interval: int = 0) -> bytes:
    """Encode with custom per-class (BITS, VALS) Huffman specs
    ([luma, chroma])."""
    from ..codecs import entropy_py
    lib = _load_native()
    if lib is not None:
        try:
            return lib.encode_scan_custom(comps, dc_specs, ac_specs,
                                          restart_interval)
        except Exception as e:
            _dispatch_fallback(e)
    # Python fallback: attach explicit codes to COPIES of the specs —
    # mutating the caller's ComponentSpec objects would make a later
    # standard-table encode silently use these custom codes.
    import copy

    comps2 = []
    for c in comps:
        c2 = copy.copy(c)
        cls = 1 if c2.chroma else 0
        c2.dc_codes = entropy_py.build_codes(*dc_specs[cls])
        c2.ac_codes = entropy_py.build_codes(*ac_specs[cls])
        comps2.append(c2)
    return entropy_py.encode_scan(comps2, restart_interval)


def jpeg_decode_scan_i8(data: bytes, pos: int,
                        comps: List["entropy_py.DecodeComponentSpec"],
                        restart_interval: int, out_i8: np.ndarray,
                        flat_base: int, max_exc: int = 16384):
    """Decode an interleaved scan straight into int8 ZIGZAG-order blocks
    + exceptions.  Returns (exc_idx, exc_val, max_zigzag_extent) or None
    when the native library is absent or the data needs the dense path
    (corrupt → ValueError propagates via None too; callers re-decode
    through the int16 path which raises the precise error)."""
    lib = _load_native()
    if lib is None:
        return None
    try:
        return lib.decode_scan_i8(data, pos, comps, restart_interval,
                                  out_i8, flat_base, max_exc)
    except Exception as e:
        _dispatch_fallback(e)
        return None


def jpeg_decode_scan_coo(data: bytes, pos: int,
                         comps: List["entropy_py.DecodeComponentSpec"],
                         restart_interval: int, out_dc: np.ndarray,
                         out_pos: np.ndarray, out_val: np.ndarray,
                         rcap: int, max_exc: int = 16384):
    """Decode an interleaved scan straight into the sparse COO upload
    layout (DC plane + per-block (zigzag pos, int8 value) AC pairs) with
    an exception list for |v| > 127 / slot overflow.  Returns (exc_idx,
    exc_val, cnt_hist, max_zigzag_extent) or None when the native
    library is absent or rejected the data."""
    lib = _load_native()
    if lib is None:
        return None
    try:
        return lib.decode_scan_coo(data, pos, comps, restart_interval,
                                   out_dc, out_pos, out_val, rcap,
                                   max_exc)
    except Exception as e:
        _dispatch_fallback(e)
        return None


def jpeg_decode_progressive_scan(data: bytes, pos: int,
                                 coefs: List[np.ndarray],
                                 bw, hs, vs, mcus_x: int, mcus_y: int,
                                 nbw, nbh, ss: int, se: int,
                                 ah: int, al: int, dc_specs, ac_spec,
                                 restart_interval: int) -> Optional[int]:
    """Apply one progressive (SOF2) scan in place via the C++ decoder.

    Returns the byte offset past the scan, or None when the native library
    is unavailable or rejected the data — `coefs` are guaranteed untouched
    in that case, so the caller can rerun the pure-Python scan decoder
    (codecs/progressive.py) from the same state.
    """
    lib = _load_native()
    if lib is None:
        return None
    try:
        return lib.decode_progressive_scan(
            data, pos, coefs, bw, hs, vs, mcus_x, mcus_y, nbw, nbh,
            ss, se, ah, al, dc_specs, ac_spec, restart_interval)
    except Exception as e:
        _dispatch_fallback(e)
        return None


def int16_to_int8_exc(arr: np.ndarray):
    """int16 → (int8, exception idx/val) split for compact device uploads."""
    lib = _load_native()
    if lib is not None:
        try:
            return lib.int16_to_int8_exc(arr)
        except ValueError:
            raise
        except Exception as e:
            _dispatch_fallback(e)
    flat = np.ascontiguousarray(arr, dtype=np.int16).ravel()
    big = np.abs(flat) > 127
    exc_idx = np.nonzero(big)[0].astype(np.int32)
    exc_val = flat[exc_idx]
    out = np.clip(flat, -127, 127).astype(np.int8)
    out[exc_idx] = 0
    return out.reshape(arr.shape), exc_idx, exc_val


# ── PNG scanline filtering ──────────────────────────────────────────────────


def png_unfilter(raw: bytes, height: int, stride: int,
                 bpp: int) -> np.ndarray:
    """Undo PNG per-row filtering; raw is height*(1+stride) filter+data rows.
    Returns (height, stride) uint8."""
    lib = _load_native()
    if lib is not None:
        try:
            return lib.png_unfilter(raw, height, stride, bpp)
        except Exception as e:
            _dispatch_fallback(e)
    return _png_unfilter_py(raw, height, stride, bpp)


def png_filter(data: np.ndarray, bpp: int,
               heuristic: bool = True) -> bytes:
    """Apply per-row PNG filtering with the minimum-sum-of-absolute-
    differences heuristic.  data: (height, stride) uint8."""
    lib = _load_native()
    if lib is not None:
        try:
            return lib.png_filter(data, bpp, heuristic)
        except Exception as e:
            _dispatch_fallback(e)
    return _png_filter_py(data, bpp, heuristic)


def rgb_to_yuv420(rgb: np.ndarray):
    """(B, H, W, 3) uint8 RGB → flat YCbCr 4:2:0 wire buffer, or None
    when the native library is unavailable (caller falls back to the
    numpy conversion in engine/batched._yuv420_wire_host)."""
    lib = _load_native()
    if lib is not None:
        try:
            return lib.rgb_to_yuv420(rgb)
        except Exception as e:
            _dispatch_fallback(e)
    return None


def rgba_to_yuv420_into(img: np.ndarray, out_row: np.ndarray) -> bool:
    """ONE (H, W, 3|4) uint8 image → its flat YCbCr 4:2:0 wire row,
    written into out_row in place (no staging copy).  Returns False when
    the native library is unavailable — the caller falls back to the
    batch conversion."""
    lib = _load_native()
    if lib is not None:
        try:
            lib.rgba_to_yuv420_into(img, out_row)
            return True
        except Exception as e:
            _dispatch_fallback(e)
    return False


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter_py(raw: bytes, height: int, stride: int,
                     bpp: int) -> np.ndarray:
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    rawb = memoryview(raw)
    for y in range(height):
        off = y * (stride + 1)
        ftype = rawb[off]
        row = bytearray(rawb[off + 1:off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"fennec: bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    return out


def _png_filter_py(data: np.ndarray, bpp: int, heuristic: bool) -> bytes:
    """Vectorized filter application: all five candidate filters are
    computed for the whole image at once, then the per-row winner is chosen
    by minimum sum of absolute differences (the standard zlib heuristic)."""
    h, stride = data.shape
    d = data.astype(np.int16)
    prev = np.vstack([np.zeros((1, stride), dtype=np.int16), d[:-1]])
    left = np.zeros_like(d)
    left[:, bpp:] = d[:, :-bpp]
    upleft = np.zeros_like(d)
    upleft[:, bpp:] = prev[:, :-bpp]

    f0 = d
    f1 = (d - left) & 0xFF
    f2 = (d - prev) & 0xFF
    f3 = (d - ((left + prev) >> 1)) & 0xFF
    p = left + prev - upleft
    pa = np.abs(p - left)
    pb = np.abs(p - prev)
    pc = np.abs(p - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, prev, upleft))
    f4 = (d - pred) & 0xFF

    cands = [f0, f1, f2, f3, f4]
    if not heuristic:
        choice = np.zeros(h, dtype=np.int64)
    else:
        # MSAD treats filtered bytes as signed deltas.
        costs = np.stack([
            np.abs(((f + 128) & 0xFF) - 128).sum(axis=1) for f in cands])
        choice = costs.argmin(axis=0)

    out = bytearray()
    for y in range(h):
        c = int(choice[y])
        out.append(c)
        out.extend(cands[c][y].astype(np.uint8).tobytes())
    return bytes(out)
