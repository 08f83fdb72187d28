"""fennec-tpu benchmark — prints ONE JSON line for the driver.

Headline metric: CompressImage (Balanced preset, 500×500 photographic
images) in images/sec/chip, end to end: device-resident SSIM-guided
quality bisection + host entropy coding of the winning quality.

Baseline: the reference does ~22 images/sec/core for the same operation on
Apple M2 (BASELINE.md: 45 ms per 500×500 CompressImage).
"""

import concurrent.futures
import json
import os
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 22.0  # reference README.md:317 → 1 / 45ms


def photo_batch(b, w, h, seed=0):
    """Photographic-looking batch: smooth gradients + low-freq noise."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    out = np.zeros((b, h, w, 4), dtype=np.float32)
    for i in range(b):
        base = np.stack([
            (x * 255 / w), (y * 255 / h), ((x + y) * 255 / (w + h))],
            axis=-1)
        noise = rng.normal(0, 10, (h // 8 + 1, w // 8 + 1, 3))
        noise = np.kron(noise, np.ones((8, 8, 1)))[:h, :w]
        out[i, :, :, :3] = np.clip(base + noise + rng.uniform(-30, 30, 3),
                                   0, 255)
        out[i, :, :, 3] = 255.0
    return out


def _enable_compile_cache():
    """Persistent XLA compile cache — compiles over the axon tunnel are
    slow; cache them across bench runs."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/fennec_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from fennec_tpu.codecs.jpeg import (
        assemble_jpeg,
        encode_scan_optimized,
    )
    from fennec_tpu.ops.dct import all_quality_tables
    from fennec_tpu.parallel.batched import (
        batched_search_and_quantize,
        packed_to_int8,
        split_packed,
    )

    platform = jax.devices()[0].platform

    B, W, H = 32, 500, 500
    # Opaque photos ship as RGB-only uint8 (alpha synthesized on device).
    imgs_np = np.ascontiguousarray(
        photo_batch(B, W, H).astype(np.uint8)[..., :3])
    targets = jnp.full((B,), 0.94, dtype=jnp.float32)

    n_workers = min(16, os.cpu_count() or 4)
    pool = concurrent.futures.ThreadPoolExecutor(n_workers)
    up = concurrent.futures.ThreadPoolExecutor(1)
    down = concurrent.futures.ThreadPoolExecutor(1)

    def upload_phase():
        """Upload + dispatch the fused search+quantize program; returns
        device handles (async)."""
        q, s, f, packed, fits8 = batched_search_and_quantize(
            jnp.asarray(imgs_np), targets, True)
        return q, s, f, packed, fits8

    def download_phase(handles):
        q, s, f, packed, fits8 = handles
        if bool(fits8):
            packed_h = np.asarray(packed_to_int8(packed))
        else:
            packed_h = np.asarray(packed)
        return np.asarray(q), np.asarray(s), np.asarray(f), packed_h

    def host_phase(round_data):
        q_h, s_h, f_h, packed_h = round_data
        qy, qcb, qcr, ph, pw = split_packed(packed_h, H, W, True)

        def encode_one(i):
            quality = int(q_h[i]) if f_h[i] else 100
            scan, dht = encode_scan_optimized(
                np.asarray(qy[i]), np.asarray(qcb[i]), np.asarray(qcr[i]),
                ph, pw, True)
            return assemble_jpeg(W, H, all_quality_tables()[quality],
                                 scan, True, dht=dht)

        return list(pool.map(encode_one, range(B))), s_h

    # Warmup / compile.
    host_phase(download_phase(upload_phase()))

    # Three-stage pipeline: upload/dispatch (k+1), download (k), host
    # Huffman (k-1) — tunnel directions and host CPU overlap.
    rounds = 8
    start = time.perf_counter()
    total_images = 0
    total_bytes = 0
    s_h = None
    up_fut = up.submit(upload_phase)
    down_fut = None
    for r in range(rounds):
        handles = up_fut.result()
        if r + 1 < rounds:
            up_fut = up.submit(upload_phase)
        if down_fut is not None:
            datas, s_h = host_phase(down_fut.result())
            total_bytes += sum(len(d) for d in datas)
            total_images += B
        down_fut = down.submit(download_phase, handles)
    datas, s_h = host_phase(down_fut.result())
    total_bytes += sum(len(d) for d in datas)
    total_images += B
    elapsed = time.perf_counter() - start

    ips = total_images / elapsed
    mean_ssim = float(np.mean(s_h))
    result = {
        "metric": "compress_image_balanced_500px_images_per_sec",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "platform": platform,
            "batch": B,
            "rounds": rounds,
            "mean_ssim": round(mean_ssim, 4),
            "avg_bytes": int(total_bytes / total_images),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
