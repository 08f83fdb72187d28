"""Baseline JPEG codec with a device (TPU) transform path.

Architecture (TPU-first, replacing the reference's stdlib codec round-trips,
compress.go:45-62 / io.go:157-169):

  encode:  host uint8 → device [color convert → 4:2:0 subsample → block DCT
           (one (N,64)×(64,64) MXU matmul) → quantize] → host Huffman
           entropy coding (C++ native when built, Python fallback).
  decode:  host marker parse + Huffman decode → quantized coefficients →
           device [dequantize → IDCT → chroma upsample → YCbCr→RGB → clamp].

The forward DCT is quality-independent, so the SSIM-guided quality search
(engine/compress.py) computes it once and re-quantizes on device inside a
lax.while_loop — the reference re-runs the full encoder+decoder per
bisection step.

Format surface: baseline sequential (SOF0/SOF1), 8-bit, grayscale or
3-component YCbCr, sampling factors 1×1/2×1/1×2/2×2, restart intervals,
multiple DQT/DHT segments.  Progressive JPEG is not supported.
"""

from __future__ import annotations

import functools
import struct
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as dct_ops
from ..ops.color import clamp_u8_device, rgb_to_ycbcr, ycbcr_to_rgb
from ..types import UnsupportedFormatError
from . import entropy_py

from .tables import (  # noqa: E402  (standard Huffman specs, Annex K.3)
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
)

# ── Device pipelines ────────────────────────────────────────────────────────


@functools.partial(jax.jit, static_argnums=(1,))
def forward_dct_device(img: jax.Array, subsample: bool):
    """(H, W, 4) float32 → unquantized DCT coefficient blocks.

    Returns (coef_y (Ny,64), coef_cb (Nc,64), coef_cr (Nc,64)) float32.
    Quality-independent: computed once per image, re-quantized per search
    step by engine/compress.py.
    """
    alpha = img[..., 3:4] * (1.0 / 255.0)
    rgb = img[..., :3] * alpha  # composite on black (Go RGBA semantics)
    ycc = rgb_to_ycbcr(rgb)
    mult = 16 if subsample else 8
    y = dct_ops.pad_to_multiple(ycc[..., 0], mult, mult)
    cb = dct_ops.pad_to_multiple(ycc[..., 1], mult, mult)
    cr = dct_ops.pad_to_multiple(ycc[..., 2], mult, mult)
    if subsample:
        cb = dct_ops.downsample_420(cb)
        cr = dct_ops.downsample_420(cr)
    coef_y = dct_ops.dct2d_blocks(dct_ops.to_blocks(y - 128.0))
    coef_cb = dct_ops.dct2d_blocks(dct_ops.to_blocks(cb - 128.0))
    coef_cr = dct_ops.dct2d_blocks(dct_ops.to_blocks(cr - 128.0))
    return coef_y, coef_cb, coef_cr


@functools.partial(jax.jit, static_argnums=(2,))
def quantize_coefs_device(coefs, qtables: jax.Array, subsample: bool):
    """Quantize (y, cb, cr) coefficient blocks with (2, 64) [luma, chroma]
    tables.  Returns float32 integral arrays."""
    y, cb, cr = coefs
    return (dct_ops.quantize_blocks(y, qtables[0]),
            dct_ops.quantize_blocks(cb, qtables[1]),
            dct_ops.quantize_blocks(cr, qtables[1]))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def reconstruct_ycbcr_device(qcoefs, qtables: jax.Array,
                             padded_h: int, padded_w: int,
                             subsample: bool, out_hw: Tuple[int, int]):
    """Quantized (y, cb, cr) blocks → (H, W, 4) float32 image (alpha=255).

    The decode half of the codec on device: dequant → IDCT → upsample →
    YCbCr→RGB → clamp → crop.
    """
    qy, qcb, qcr = qcoefs
    y = dct_ops.from_blocks(
        dct_ops.idct2d_blocks(dct_ops.dequantize_blocks(qy, qtables[0])),
        padded_h, padded_w) + 128.0
    ch, cw = (padded_h // 2, padded_w // 2) if subsample \
        else (padded_h, padded_w)
    cb = dct_ops.from_blocks(
        dct_ops.idct2d_blocks(dct_ops.dequantize_blocks(qcb, qtables[1])),
        ch, cw) + 128.0
    cr = dct_ops.from_blocks(
        dct_ops.idct2d_blocks(dct_ops.dequantize_blocks(qcr, qtables[1])),
        ch, cw) + 128.0
    if subsample:
        cb = dct_ops.upsample_420(cb)
        cr = dct_ops.upsample_420(cr)
    h, w = out_hw
    ycc = jnp.stack([y[:h, :w], cb[:h, :w], cr[:h, :w]], axis=-1)
    rgb = clamp_u8_device(ycbcr_to_rgb(ycc))
    alpha = jnp.full(rgb.shape[:2] + (1,), 255.0, dtype=jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


# ── Container assembly ──────────────────────────────────────────────────────


def _marker(m: int, payload: bytes = b"") -> bytes:
    if payload:
        return struct.pack(">BBH", 0xFF, m, len(payload) + 2) + payload
    return struct.pack(">BB", 0xFF, m)


def _dqt_segment(tables: np.ndarray) -> bytes:
    """DQT with tables 0 (luma) and 1 (chroma) in zigzag order."""
    payload = b""
    for tid in range(tables.shape[0]):
        zz = tables[tid][dct_ops.ZIGZAG]
        payload += bytes([tid]) + bytes(int(v) for v in zz)
    return _marker(0xDB, payload)


def _dht_segment() -> bytes:
    payload = b""
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        payload += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return _marker(0xC4, payload)


def _dht_segment_custom(dc_specs, ac_specs, ncomp: int = 3) -> bytes:
    """DHT for per-image optimized tables ([luma, chroma] spec pairs)."""
    entries = [(0x00, dc_specs[0]), (0x10, ac_specs[0])]
    if ncomp > 1:
        entries += [(0x01, dc_specs[1]), (0x11, ac_specs[1])]
    payload = b""
    for tc_th, (bits, vals) in entries:
        payload += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return _marker(0xC4, payload)


def _sof0_segment(w: int, h: int, ncomp: int, subsample: bool) -> bytes:
    payload = struct.pack(">BHHB", 8, h, w, ncomp)
    if ncomp == 1:
        payload += bytes([1, 0x11, 0])
    else:
        ys = 0x22 if subsample else 0x11
        payload += bytes([1, ys, 0])
        payload += bytes([2, 0x11, 1])
        payload += bytes([3, 0x11, 1])
    return _marker(0xC0, payload)


def _sos_segment(ncomp: int) -> bytes:
    payload = bytes([ncomp])
    if ncomp == 1:
        payload += bytes([1, 0x00])
    else:
        payload += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    payload += bytes([0, 63, 0])
    return _marker(0xDA, payload)


_APP0_JFIF = _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")


def assemble_jpeg(w: int, h: int, qtables: np.ndarray,
                  scan_data: bytes, subsample: bool,
                  ncomp: int = 3,
                  dht: Optional[bytes] = None) -> bytes:
    """Wrap an entropy-coded scan in a JFIF container (standard Huffman
    tables unless a custom DHT segment is supplied)."""
    return (_marker(0xD8) + _APP0_JFIF + _dqt_segment(qtables)
            + _sof0_segment(w, h, ncomp, subsample)
            + (dht if dht is not None else _dht_segment())
            + _sos_segment(ncomp) + scan_data + _marker(0xD9))


# ── Host encode ─────────────────────────────────────────────────────────────


def encode_scan_from_quantized(
        qy: np.ndarray, qcb: Optional[np.ndarray],
        qcr: Optional[np.ndarray], padded_h: int, padded_w: int,
        subsample: bool) -> bytes:
    """Entropy-code quantized coefficient blocks (natural order, raster)
    with the standard Annex-K tables."""
    from .. import native

    comps = _build_comps(qy, qcb, qcr, padded_h, padded_w, subsample)
    return native.jpeg_encode_scan(comps)


def _build_comps(qy, qcb, qcr, padded_h: int, padded_w: int,
                 subsample: bool):
    by, bx = padded_h // 8, padded_w // 8
    if qcb is None:
        return [entropy_py.ComponentSpec(qy, bx, by, 1, 1, chroma=False)]
    if subsample:
        cby, cbx = padded_h // 16, padded_w // 16
        yh = yv = 2
    else:
        cby, cbx = by, bx
        yh = yv = 1
    return [
        entropy_py.ComponentSpec(qy, bx, by, yh, yv, chroma=False),
        entropy_py.ComponentSpec(qcb, cbx, cby, 1, 1, chroma=True),
        entropy_py.ComponentSpec(qcr, cbx, cby, 1, 1, chroma=True),
    ]


def encode_scan_optimized(qy, qcb, qcr, padded_h: int, padded_w: int,
                          subsample: bool):
    """Two-pass entropy coding with per-image optimal Huffman tables.

    Returns (scan_bytes, dht_segment) — typically 3-8% smaller than the
    standard Annex-K tables at identical pixels (the reference cannot do
    this; Go stdlib has no optimizer).
    """
    from .. import native
    from .huffopt import specs_from_frequencies

    comps = _build_comps(qy, qcb, qcr, padded_h, padded_w, subsample)
    dc_freq, ac_freq = native.jpeg_count_symbols(comps)
    dc_specs, ac_specs = specs_from_frequencies(dc_freq, ac_freq)
    scan = native.jpeg_encode_scan_custom(comps, dc_specs, ac_specs)
    dht = _dht_segment_custom(dc_specs, ac_specs, ncomp=len(comps))
    return scan, dht


def encode_jpeg(img: np.ndarray, quality: int,
                subsample: bool = True) -> bytes:
    """Encode an (H, W, 4) uint8 NRGBA image as baseline JPEG.

    Device does color convert + DCT + quantization; host does entropy
    coding.  4:2:0 when subsample else 4:4:4 (the reference's stdlib is
    fixed 4:2:0, io.go:157-169; fennec-tpu honors the Options.subsample
    flag, types.go:146-153 reserved it for exactly this).
    """
    from ..image import to_nrgba_ref

    arr = to_nrgba_ref(np.asarray(img))
    h, w = arr.shape[:2]
    coefs = forward_dct_device(jnp.asarray(arr, dtype=jnp.float32),
                               bool(subsample))
    return encode_jpeg_from_coefs(coefs, w, h, quality, subsample)


def encode_jpeg_from_coefs(coefs, w: int, h: int, quality: int,
                           subsample: bool,
                           optimize: bool = False) -> bytes:
    """Entropy-encode precomputed DCT coefficients at the given quality.

    optimize=True builds per-image optimal Huffman tables (two host
    passes; ~3-8% smaller files)."""
    quality = min(100, max(1, int(quality)))
    qtables = dct_ops.all_quality_tables()[quality]
    qcoefs = quantize_coefs_device(coefs, jnp.asarray(qtables),
                                   bool(subsample))
    qy = np.asarray(qcoefs[0], dtype=np.int32)
    qcb = np.asarray(qcoefs[1], dtype=np.int32)
    qcr = np.asarray(qcoefs[2], dtype=np.int32)
    mult = 16 if subsample else 8
    ph, pw = h + (-h) % mult, w + (-w) % mult
    if optimize:
        scan, dht = encode_scan_optimized(qy, qcb, qcr, ph, pw, subsample)
        return assemble_jpeg(w, h, qtables, scan, subsample, dht=dht)
    scan = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, subsample)
    return assemble_jpeg(w, h, qtables, scan, subsample)


# ── Host decode ─────────────────────────────────────────────────────────────


class JpegHeader:
    """Parsed JPEG structure up to (and including) the SOS header."""

    def __init__(self) -> None:
        self.width = 0
        self.height = 0
        self.ncomp = 0
        self.comps: List[dict] = []  # id, h, v, tq
        self.qtables: Dict[int, np.ndarray] = {}  # natural order
        self.dc_tables: Dict[int, tuple] = {}
        self.ac_tables: Dict[int, tuple] = {}
        self.restart_interval = 0
        self.scan_comps: List[dict] = []  # comp idx, dc table id, ac table id
        self.scan_offset = 0
        self.progressive = False
        # Adobe APP14 color transform: None = no marker; 0 = none
        # (RGB/CMYK by component count), 1 = YCbCr, 2 = YCCK.
        self.adobe_transform: "int | None" = None
        self.jfif = False  # APP0 'JFIF' seen (forces YCbCr, like Go)


def parse_jpeg(data: bytes) -> JpegHeader:
    """Parse baseline JPEG markers through SOS (T.81 B.2)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("fennec: not a JPEG")
    hdr = JpegHeader()
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, hdr)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, hdr)
        elif marker == 0xDD:  # DRI
            hdr.restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline)
            _parse_sof(seg, hdr)
        elif marker == 0xC2:
            # Progressive: handled by codecs/progressive.py (decode_jpeg
            # dispatches there before calling parse_jpeg).
            raise UnsupportedFormatError(
                "fennec: progressive JPEG requires the progressive decoder")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedFormatError(
                f"fennec: unsupported JPEG SOF marker 0x{marker:02X}")
        elif marker == 0xE0 and seg[:5] == b"JFIF\x00":  # APP0
            hdr.jfif = True
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            # 'Adobe' + version(2) + flags0(2) + flags1(2) + transform(1)
            if len(seg) >= 12:
                hdr.adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            _parse_sos(seg, hdr)
            hdr.scan_offset = pos + 2 + seg_len
            return hdr
        pos += 2 + seg_len
    raise ValueError("fennec: corrupt JPEG: no SOS marker")


def _parse_dqt(seg: bytes, hdr: JpegHeader) -> None:
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        if pq == 0:
            vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(
                np.int32)
            i += 64
        else:
            vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(
                np.int32)
            i += 128
        nat = np.zeros(64, dtype=np.int32)
        nat[dct_ops.ZIGZAG] = vals
        hdr.qtables[tq] = nat


def _parse_dht(seg: bytes, hdr: JpegHeader) -> None:
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        bits = list(seg[i:i + 16])
        i += 16
        n = sum(bits)
        # T.81 C.2: at most 256 values; a crafted BITS array can claim
        # 16*255 — reject here so neither decoder sees an oversized or
        # truncated spec (Go stdlib errors identically).
        if n > 256:
            raise ValueError("fennec: corrupt JPEG: DHT declares >256 values")
        vals = list(seg[i:i + n])
        if len(vals) < n:
            raise ValueError("fennec: corrupt JPEG: truncated DHT")
        i += n
        # Store the raw (BITS, VALS) spec; decoders build their own
        # lookup structures (Python canonical tables or C++ fast LUTs).
        if tc == 0:
            hdr.dc_tables[th] = (bits, vals)
        else:
            hdr.ac_tables[th] = (bits, vals)


def _parse_sof(seg: bytes, hdr: JpegHeader) -> None:
    precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
    if precision != 8:
        raise UnsupportedFormatError("fennec: only 8-bit JPEG supported")
    hdr.height, hdr.width, hdr.ncomp = h, w, ncomp
    for c in range(ncomp):
        cid, hv, tq = seg[6 + c * 3:9 + c * 3]
        hdr.comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                          "tq": tq})


def _parse_sos(seg: bytes, hdr: JpegHeader) -> None:
    ns = seg[0]
    for i in range(ns):
        cs, tables = seg[1 + i * 2], seg[2 + i * 2]
        idx = next((j for j, c in enumerate(hdr.comps) if c["id"] == cs),
                   None)
        if idx is None:
            raise ValueError(
                "fennec: corrupt JPEG: SOS names unknown component")
        hdr.scan_comps.append({"comp": idx, "td": tables >> 4,
                               "ta": tables & 0x0F})


def _build_decode_specs(hdr: JpegHeader):
    """MCU grid geometry + per-scan-component decode specs shared by the
    int16 and fused-int8 single-scan decode paths."""
    hmax = max(c["h"] for c in hdr.comps)
    vmax = max(c["v"] for c in hdr.comps)
    mcus_x = -(-hdr.width // (8 * hmax))
    mcus_y = -(-hdr.height // (8 * vmax))
    specs = []
    for sc in hdr.scan_comps:
        c = hdr.comps[sc["comp"]]
        if sc["td"] not in hdr.dc_tables or sc["ta"] not in hdr.ac_tables:
            raise ValueError(
                "fennec: corrupt JPEG: scan references missing DHT")
        specs.append(entropy_py.DecodeComponentSpec(
            mcus_x * c["h"], mcus_y * c["v"], c["h"], c["v"],
            hdr.dc_tables[sc["td"]], hdr.ac_tables[sc["ta"]]))
    return mcus_x, mcus_y, hmax, vmax, specs


def decode_jpeg_to_coefs(data: bytes):
    """Decode a baseline JPEG to quantized coefficients + metadata.

    Returns (hdr, coefs) where coefs[i] is an (nblocks, 64) int16 array in
    natural order for component i of the frame; block grids tile the MCU
    lattice.  Handles both the common single interleaved scan (C++ fast
    path) and multi-scan non-interleaved files (one scan per component,
    Python path — Go's stdlib also supports these).
    """
    from .. import native

    hdr = parse_jpeg(data)
    mcus_x, mcus_y, hmax, vmax, specs = _build_decode_specs(hdr)
    if len(hdr.scan_comps) != hdr.ncomp:
        return _decode_multiscan_to_coefs(data, hdr, mcus_x, mcus_y,
                                          hmax, vmax)
    coefs = native.jpeg_decode_scan(data, hdr.scan_offset, specs,
                                    hdr.restart_interval)
    return hdr, coefs


def decode_jpeg_to_coefs_i8(data: bytes, out_flat: np.ndarray,
                            flat_base: int, max_exc: int = 16384):
    """Decode a single-scan baseline JPEG straight into a flat int8
    ZIGZAG-order block buffer with a sparse |v| > 127 exception list —
    the upload format of the fused batch engine.  One C++ pass, no
    intermediate int16 arrays.

    Returns (hdr, exc_idx, exc_val, max_zigzag_extent) or None when the
    fast path doesn't apply (multi-scan file, native library absent,
    exception overflow); callers fall back to decode_jpeg_to_coefs.
    """
    from .. import native

    hdr = parse_jpeg(data)
    if len(hdr.scan_comps) != hdr.ncomp:
        return None
    _, _, _, _, specs = _build_decode_specs(hdr)
    r = native.jpeg_decode_scan_i8(data, hdr.scan_offset, specs,
                                   hdr.restart_interval, out_flat,
                                   flat_base, max_exc)
    if r is None:
        return None
    return hdr, r[0], r[1], r[2]


def decode_jpeg_to_coefs_coo(data: bytes, out_dc: np.ndarray,
                             out_pos: np.ndarray, out_val: np.ndarray,
                             rcap: int, max_exc: int = 16384):
    """Decode a single-scan baseline JPEG straight into the sparse COO
    upload layout (DC int8 plane + (zigzag position, int8 value) AC
    nonzero pairs padded to rcap slots per block) — one C++ pass, no
    dense intermediates.  |v| > 127 values and slot overflow ride the
    exception list as image-local offsets into the NT*64 zigzag layout.

    Returns (hdr, exc_idx, exc_val, cnt_hist, max_zigzag_extent) or
    None when the fast path doesn't apply; callers fall back to
    decode_jpeg_to_coefs_i8 / decode_jpeg_to_coefs.
    """
    from .. import native

    hdr = parse_jpeg(data)
    if len(hdr.scan_comps) != hdr.ncomp:
        return None
    _, _, _, _, specs = _build_decode_specs(hdr)
    r = native.jpeg_decode_scan_coo(data, hdr.scan_offset, specs,
                                    hdr.restart_interval, out_dc,
                                    out_pos, out_val, rcap, max_exc)
    if r is None:
        return None
    return hdr, r[0], r[1], r[2], r[3]


def _decode_multiscan_to_coefs(data: bytes, hdr: JpegHeader,
                               mcus_x: int, mcus_y: int,
                               hmax: int, vmax: int):
    """Baseline multi-scan decode: one (or a subset of) component(s) per
    SOS.  Non-interleaved scans cover only the component's own
    ceil(dim/8) block grid (T.81 A.2.2); results land in the MCU-padded
    grids the device reconstruction expects."""
    out = []
    for c in hdr.comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        out.append(np.zeros((bw * bh, 64), dtype=np.int16))

    pos = hdr.scan_offset
    scan_comps = hdr.scan_comps
    while True:
        if len(scan_comps) == 1:
            sc = scan_comps[0]
            c = hdr.comps[sc["comp"]]
            comp_w = -(-hdr.width * c["h"] // hmax)
            comp_h = -(-hdr.height * c["v"] // vmax)
            nbw, nbh = -(-comp_w // 8), -(-comp_h // 8)
            spec = entropy_py.DecodeComponentSpec(
                nbw, nbh, 1, 1, hdr.dc_tables[sc["td"]],
                hdr.ac_tables[sc["ta"]])
            blocks, pos = entropy_py.decode_scan(
                data, pos, [spec], hdr.restart_interval)
            # Copy the component grid rows into the MCU-padded grid.
            bw = mcus_x * c["h"]
            dst = out[sc["comp"]].reshape(-1, 64)
            src = blocks[0]
            for by in range(nbh):
                dst[by * bw:by * bw + nbw] = src[by * nbw:(by + 1) * nbw]
        else:
            specs = []
            for sc in scan_comps:
                c = hdr.comps[sc["comp"]]
                specs.append(entropy_py.DecodeComponentSpec(
                    mcus_x * c["h"], mcus_y * c["v"], c["h"], c["v"],
                    hdr.dc_tables[sc["td"]], hdr.ac_tables[sc["ta"]]))
            blocks, pos = entropy_py.decode_scan(
                data, pos, specs, hdr.restart_interval)
            for sc, blk in zip(scan_comps, blocks):
                out[sc["comp"]][:] = blk

        # Advance to the next SOS (tables may appear between scans).
        scan_comps = None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF or data[pos + 1] == 0x00:
                pos += 1
                continue
            marker = data[pos + 1]
            if 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            seg = data[pos + 4:pos + 2 + seg_len]
            if marker == 0xC4:
                _parse_dht(seg, hdr)
            elif marker == 0xDB:
                _parse_dqt(seg, hdr)
            elif marker == 0xDD:
                hdr.restart_interval = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:
                hdr.scan_comps = []
                _parse_sos(seg, hdr)
                scan_comps = hdr.scan_comps
                pos = pos + 2 + seg_len
                break
            pos += 2 + seg_len
        if scan_comps is None:
            break
    # Downstream consumers iterate hdr.scan_comps zipped with coefs;
    # normalize to frame order covering every component.
    hdr.scan_comps = [{"comp": i, "td": 0, "ta": 0}
                      for i in range(hdr.ncomp)]
    return hdr, out


def is_progressive_jpeg(data: bytes) -> bool:
    """True when the stream's frame header is SOF2 (progressive DCT)."""
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        return False
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1, 0xDA):
            return False
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        pos += 2 + seg_len
    return False


def _decode_progressive(data: bytes) -> np.ndarray:
    from .progressive import decode_progressive_to_coefs

    dec, coefs = decode_progressive_to_coefs(data)
    planes = []
    for i, c in enumerate(dec.comps):
        qt = jnp.asarray(dec.qtables[c["tq"]], dtype=jnp.float32)
        plane = _decode_plane_device(
            jnp.asarray(coefs[i], dtype=jnp.float32), qt,
            c["bh"] * 8, c["bw"] * 8,
            dec.hmax // c["h"], dec.vmax // c["v"])
        planes.append(plane)
    out = _combine_planes_device(tuple(planes), dec.height, dec.width,
                                 jpeg_color_mode(dec))
    return np.asarray(out, dtype=np.uint8)


def jpeg_color_mode(hdr: JpegHeader) -> str:
    """Frame color model, following Go stdlib's heuristics
    (reference io.go:82 decodes via image/jpeg, whose reader treats a
    3-component frame as RGB when the Adobe APP14 transform is 0 or the
    component IDs are 'R','G','B', and a 4-component frame as YCCK when
    the transform is 2, else Adobe-inverted CMYK)."""
    if hdr.ncomp == 1:
        return "gray"
    if hdr.ncomp == 3:
        # Go image/jpeg isRGB: a JFIF APP0 forces YCbCr even with
        # 'R','G','B' component IDs; Adobe transform 0 or RGB IDs
        # (without JFIF) mean RGB.
        ids = [c["id"] for c in hdr.comps]
        if not getattr(hdr, "jfif", False) and (
                hdr.adobe_transform == 0 or ids == [0x52, 0x47, 0x42]):
            return "rgb"
        return "ycbcr"
    if hdr.ncomp == 4:
        if hdr.adobe_transform is None:
            # Go image/jpeg: "unknown color model: 4-component JPEG" —
            # inventing an interpretation risks silent wrong colors.
            raise UnsupportedFormatError(
                "fennec: 4-component JPEG without Adobe APP14 marker")
        return "ycck" if hdr.adobe_transform == 2 else "cmyk"
    raise UnsupportedFormatError(
        f"fennec: unsupported {hdr.ncomp}-component JPEG")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to (H, W, 4) uint8 NRGBA.

    Handles grayscale, YCbCr, Adobe RGB, and 4-component Adobe
    CMYK/YCCK frames (the reference gets these via Go stdlib
    image/jpeg; io.go:82)."""
    if is_progressive_jpeg(data):
        return _decode_progressive(data)
    hdr, coefs = decode_jpeg_to_coefs(data)
    hmax = max(c["h"] for c in hdr.comps)
    vmax = max(c["v"] for c in hdr.comps)
    mcus_x = -(-hdr.width // (8 * hmax))
    mcus_y = -(-hdr.height // (8 * vmax))

    planes = []
    for i, sc in enumerate(hdr.scan_comps):
        c = hdr.comps[sc["comp"]]
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        qt = jnp.asarray(hdr.qtables[c["tq"]], dtype=jnp.float32)
        plane = _decode_plane_device(
            jnp.asarray(coefs[i], dtype=jnp.float32), qt, bh * 8, bw * 8,
            hmax // c["h"], vmax // c["v"])
        planes.append(plane)

    out = _combine_planes_device(tuple(planes), hdr.height, hdr.width,
                                 jpeg_color_mode(hdr))
    return np.asarray(out, dtype=np.uint8)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _decode_plane_device(qcoefs, qtable, ph: int, pw: int,
                         rep_x: int, rep_y: int):
    plane = dct_ops.from_blocks(
        dct_ops.idct2d_blocks(dct_ops.dequantize_blocks(qcoefs, qtable)),
        ph, pw) + 128.0
    if rep_y > 1:
        plane = jnp.repeat(plane, rep_y, axis=0)
    if rep_x > 1:
        plane = jnp.repeat(plane, rep_x, axis=1)
    return plane


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _combine_planes_device(planes, h: int, w: int, mode: str):
    if mode == "gray":
        y = jnp.clip(jnp.floor(planes[0][:h, :w] + 0.5), 0, 255)
        rgb = jnp.stack([y, y, y], axis=-1)
    elif mode == "rgb":
        rgb = clamp_u8_device(
            jnp.stack([p[:h, :w] for p in planes[:3]], axis=-1))
    elif mode in ("cmyk", "ycck"):
        # Adobe 4-component frames store INVERTED ink values; Go stdlib
        # inverts all four planes into image.CMYK and color.CMYKToRGB
        # then computes r = (255-C)(255-K)/255 — the two inversions
        # cancel, leaving rgb = base * k_raw / 255 (floor division on
        # uint8-rounded planes) with base = the raw CMY samples (cmyk)
        # or the YCbCr→RGB conversion of the first three planes (ycck).
        if mode == "ycck":
            ycc = jnp.stack([p[:h, :w] for p in planes[:3]], axis=-1)
            base = clamp_u8_device(ycbcr_to_rgb(ycc))
        else:
            base = clamp_u8_device(
                jnp.stack([p[:h, :w] for p in planes[:3]], axis=-1))
        k = clamp_u8_device(planes[3][:h, :w])[..., None]
        # Integer division keeps Go's exact x*k/255 semantics (a float
        # divide can land at 254.9999 and floor one unit low).
        rgb = ((base.astype(jnp.int32) * k.astype(jnp.int32)) //
               255).astype(jnp.float32)
    else:  # ycbcr
        ycc = jnp.stack([p[:h, :w] for p in planes[:3]], axis=-1)
        rgb = clamp_u8_device(ycbcr_to_rgb(ycc))
    alpha = jnp.full((h, w, 1), 255.0, dtype=jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)
