"""Per-image optimal Huffman table construction (ITU T.81 Annex K.2).

The reference encodes with the fixed Annex-K tables (Go stdlib has no
optimizer); fennec-tpu can build length-limited optimal tables from the
actual symbol statistics of each image — typically 3–8% smaller files at
identical pixels/SSIM.  Enabled by Options.optimize_huffman (default on
for the engine paths; the raw codec keeps standard tables unless asked).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def optimal_spec(freq: np.ndarray) -> Tuple[List[int], List[int]]:
    """(BITS[16], VALS) for the given symbol frequencies.

    Implements the one-reserved-symbol, 16-bit-limited code construction
    of T.81 K.2 (the libjpeg jpeg_gen_optimal_table procedure): pairwise
    merge of the two least-frequent chains, then redistribution of code
    lengths beyond 16 bits.
    """
    n = len(freq)
    if not np.any(np.asarray(freq) > 0):
        # No coded symbols: empty spec (the table is never referenced).
        return [0] * 16, []
    f = np.zeros(n + 1, dtype=np.int64)
    f[:n] = freq
    f[n] = 1  # reserved symbol: guarantees no all-ones code
    codesize = np.zeros(n + 1, dtype=np.int64)
    others = np.full(n + 1, -1, dtype=np.int64)

    while True:
        nz = np.nonzero(f > 0)[0]
        if nz.size <= 1:
            break
        fnz = f[nz]
        m1 = fnz.min()
        v1 = int(nz[fnz == m1].max())
        rest = nz[nz != v1]
        frest = f[rest]
        m2 = frest.min()
        v2 = int(rest[frest == m2].max())

        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1

    bits = np.zeros(33, dtype=np.int64)
    for s in range(n + 1):
        cs = int(codesize[s])
        if cs > 32:
            # libjpeg's jpeg_gen_optimal_table errors here: clamping
            # would oversubscribe bits[32] and break the Kraft invariant
            # the K.3 redistribution assumes, emitting a broken DHT.
            raise ValueError(
                "fennec: optimal Huffman code length exceeds 32 bits")
        if cs > 0:
            bits[cs] += 1

    # Limit code lengths to 16 bits (K.2 Figure K.3).
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's slot

    # VALS: real symbols ordered by (code length, symbol value).
    order = sorted((s for s in range(n) if codesize[s] > 0),
                   key=lambda s: (int(codesize[s]), s))
    return [int(b) for b in bits[1:17]], order


def specs_from_frequencies(dc_freq: np.ndarray, ac_freq: np.ndarray):
    """Build (dc_specs, ac_specs) lists for classes [luma, chroma] from
    (2, 16) and (2, 256) frequency arrays; classes with no symbols get a
    minimal valid table.  Uses the C++ K.2 builder when available (the
    Python merge loop costs ~2 ms per image — a real term on the batch
    pipeline's single-core host)."""
    return specs_from_frequencies_batch(dc_freq[None], ac_freq[None])[0]


def _specs_from_frequencies_py(dc_freq: np.ndarray, ac_freq: np.ndarray):
    """Pure-Python path (also the parity oracle for the C++ builder)."""
    dc_specs, ac_specs = [], []
    for cls in range(2):
        dfi = dc_freq[cls].copy()
        afi = ac_freq[cls].copy()
        if dfi.sum() == 0:
            dfi[0] = 1
        if afi.sum() == 0:
            afi[0] = 1
        dc_specs.append(optimal_spec(dfi))
        ac_specs.append(optimal_spec(afi))
    return dc_specs, ac_specs


_NATIVE_FALLBACK_WARNED = False

# Native-builder failures that should degrade to the Python path with a
# warning: load/symbol problems, rc!=0, and ctypes ABI drift (argtype
# mismatches raise ctypes.ArgumentError / TypeError — see
# native._dispatch_fallback for the same policy).  ValueError is
# deliberately NOT here: the overlong-code-length error is raised
# identically by both builders and must propagate.
def _native_error_types():
    import ctypes

    return (OSError, AttributeError, RuntimeError, TypeError,
            ctypes.ArgumentError)


def _warn_native_fallback(exc: Exception) -> None:
    """The C spec builder failing is a real regression (the Python loop
    is ~2 ms/image on the single-core host) — say so once instead of
    silently degrading batch throughput."""
    global _NATIVE_FALLBACK_WARNED
    if not _NATIVE_FALLBACK_WARNED:
        import sys

        print(f"fennec: native optimal-Huffman builder failed "
              f"({exc!r}); falling back to the Python path",
              file=sys.stderr, flush=True)
        _NATIVE_FALLBACK_WARNED = True


def specs_from_frequencies_batch(dc_freq: np.ndarray, ac_freq: np.ndarray):
    """Batch spec construction: (B, 2, 16) / (B, 2, 256) int64 → list of
    per-image (dc_specs, ac_specs), one C call for the whole batch."""
    from ..native import _load_native

    lib = _load_native()
    if lib is not None:
        try:
            bits, vals, nvals = lib.build_optimal_specs(dc_freq, ac_freq)
        except _native_error_types() as e:
            _warn_native_fallback(e)
        else:
            return _specs_from_raw(bits, vals, nvals)
    return [
        _specs_from_frequencies_py(dc_freq[j], ac_freq[j])
        for j in range(dc_freq.shape[0])]


def _specs_from_raw(bits: np.ndarray, vals: np.ndarray,
                    nvals: np.ndarray) -> list:
    """(B, 4, 16)/(B, 4, V)/(B, 4) C-builder output → per-image
    (dc_specs, ac_specs) lists.  Table order from C: dc-luma, dc-chroma,
    ac-luma, ac-chroma."""
    out = []
    for j in range(bits.shape[0]):
        dc_specs = [
            (bits[j, cls].tolist(),
             vals[j, cls, :nvals[j, cls]].tolist())
            for cls in range(2)]
        ac_specs = [
            (bits[j, 2 + cls].tolist(),
             vals[j, 2 + cls, :nvals[j, 2 + cls]].tolist())
            for cls in range(2)]
        out.append((dc_specs, ac_specs))
    return out


def code_tables_batch(bits: np.ndarray, vals: np.ndarray,
                      nvals: np.ndarray, size: int) -> np.ndarray:
    """Vectorized canonical code tables for N specs at once.

    bits (N, 16) per-length counts, vals (N, V) symbols in canonical
    (length, value) order, nvals (N,) valid counts.  Returns (N, size)
    int32 PACKED tables: entry = code << 5 | length (length ≤ 16 fits 5
    bits, code ≤ 16 bits — 21 bits total); 0 = absent symbol.

    Replaces the per-image Python loop over _code_arrays (the canonical
    walk: code += 1 per symbol, code <<= 1 per length step) with closed
    form: c_k = (2^{L_k} · Σ_{j<k} 2^{16-L_j}) >> 16, exact in int64
    because lengths are nondecreasing in canonical order.
    """
    n, v = vals.shape
    k = np.arange(v, dtype=np.int64)
    cum = np.cumsum(bits.astype(np.int64), axis=1)  # (N, 16)
    # Length of the k-th canonical symbol = 1 + #lengths exhausted at k.
    lens = 1 + np.sum(k[None, None, :] >= cum[:, :, None], axis=1)
    valid = k[None, :] < nvals[:, None].astype(np.int64)
    lens = np.where(valid, lens, 0)
    kraft = np.where(valid, np.int64(1) << (16 - lens), 0)
    pre = np.cumsum(kraft, axis=1) - kraft
    codes = ((np.int64(1) << lens) * pre) >> 16
    packed = ((codes << 5) | lens).astype(np.int32)
    # Scatter to symbol positions; invalid lanes land in a spill column.
    out = np.zeros((n, size + 1), np.int32)
    tgt = np.where(valid, vals.astype(np.int64), size)
    np.put_along_axis(out, tgt, np.where(valid, packed, 0), axis=1)
    return out[:, :size]


def _packed_tables_from_specs(specs: list):
    """Fallback packed-table build from spec lists (no C builder)."""
    from ..ops.jpeg_emit import _code_arrays

    b = len(specs)
    dcp = np.zeros((b, 2, 16), np.int32)
    acp = np.zeros((b, 2, 256), np.int32)
    for j, (dc_specs, ac_specs) in enumerate(specs):
        for cls in range(2):
            c, ln = _code_arrays(*dc_specs[cls], 16)
            dcp[j, cls] = (c << 5) | ln
            c, ln = _code_arrays(*ac_specs[cls], 256)
            acp[j, cls] = (c << 5) | ln
    return dcp, acp


def specs_and_tables_batch(dc_freq: np.ndarray, ac_freq: np.ndarray):
    """One call for everything the optimal-Huffman emit stage needs:
    per-image spec lists (for DHT segments) + packed device code tables.

    Returns (specs, dc_packed (B, 2, 16) int32, ac_packed (B, 2, 256)
    int32) with entries code << 5 | length (see code_tables_batch).
    """
    from ..native import _load_native

    lib = _load_native()
    if lib is not None:
        try:
            bits, vals, nvals = lib.build_optimal_specs(dc_freq, ac_freq)
        except _native_error_types() as e:
            _warn_native_fallback(e)
        else:
            b = bits.shape[0]
            dcp = code_tables_batch(
                bits[:, :2].reshape(b * 2, 16),
                vals[:, :2].reshape(b * 2, -1),
                nvals[:, :2].reshape(-1), 16).reshape(b, 2, 16)
            acp = code_tables_batch(
                bits[:, 2:].reshape(b * 2, 16),
                vals[:, 2:].reshape(b * 2, -1),
                nvals[:, 2:].reshape(-1), 256).reshape(b, 2, 256)
            return _specs_from_raw(bits, vals, nvals), dcp, acp
    specs = [_specs_from_frequencies_py(dc_freq[j], ac_freq[j])
             for j in range(dc_freq.shape[0])]
    dcp, acp = _packed_tables_from_specs(specs)
    return specs, dcp, acp
