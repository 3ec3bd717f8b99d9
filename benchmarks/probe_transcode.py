"""Probe: where the device transcode pass loses time beyond decode+encode.

run_device_decode.py measures decode 39.5 ms, decode+blur3 51.8 ms,
encode (from NHWC pixels) 8.6 ms, but the full transcode chain 81.7 ms —
~20 ms more than the sum. Suspects: the rows->NHWC->per-channel layout
work at the decode->encode seam (4-D NHWC uint8 intermediates tile
pathologically, CLAUDE.md) and the encoder's padding/downsample stages.

Segments (each a chained coefs->coefs pass so nothing is elided):
  decode        — coefficients -> rows
  +blur         — ... -> filtered rows
  +ycc          — ... -> YCbCr int32 planes (the NHWC seam crossed)
  +downsample   — ... -> padded + downsampled chroma
  full          — ... -> quantized coefficients (fDCT+quant included)

Run serially on the real TPU: python benchmarks/probe_transcode.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HIPE_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sync(v) -> float:
    return float(np.asarray(v))


def measure(chained, arr, passes: int, reps: int = 3) -> float:
    sync(chained(arr, 1))
    sync(chained(arr, 1 + passes))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(chained(arr, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chained(arr, 1 + passes))
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / passes)
    return best if best > 0 else t2 / (1 + passes)


def main() -> int:
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.models import pipelines as plib
    from hipe_tpu.ops import jpeg_decode as jd
    from hipe_tpu.ops import jpeg_encode as je
    from hipe_tpu.utils.cache import enable_compilation_cache
    from hipe_tpu.utils.images import load_test_image

    enable_compilation_cache()
    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    num_images = 2000 if on_tpu else 8
    passes = 8 if on_tpu else 2

    img = load_test_image()
    payload = jpeg.encode_bytes_opts(img, quality=90, subsampling="420")
    co = jpeg.read_coefficients(payload)
    geo = jd.geometry_of(co)
    qts = [np.asarray(c.qtable) for c in co.components]
    h, w = geo.height, geo.width
    enc_geo = je.encode_geometry(h, w, 3, "420")
    luma, chroma = jpeg.quality_tables(90)
    enc_qt = [luma, chroma, chroma]
    hs, vs = enc_geo.max_h, enc_geo.max_v
    _, _, ywb, yhb = enc_geo.comps[0]
    _, _, cwb, chb = enc_geo.comps[1]
    imcu_w = 8 * hs * -(-w // (8 * hs))
    group_h = vs * -(-h // vs)
    pipe = plib.get("blur3")
    log(f"backend={backend} {h}x{w}")

    comp_batches = [
        jax.device_put(
            np.broadcast_to(c.coefs, (num_images, *c.coefs.shape)).copy()
        )
        for c in co.components
    ]

    results: dict = {
        "metric": "transcode_segments_2000x256x256_blur3",
        "backend": backend,
    }

    def feed(x, cs):
        z = (jnp.min(x).astype(jnp.int16) >> 9)
        return [c + z for c in cs]

    def stage_fn(stage: str):
        def one(cs):
            rows = jd.decode_planes(geo, cs, qts, layout="rows")
            if stage == "decode":
                return feed(rows, cs)
            b = rows.shape[0]
            rows = pipe.apply_rows(rows, 3, use_pallas=on_tpu, alias=on_tpu)
            if stage == "blur":
                return feed(rows, cs)
            imgx = rows.reshape(b, h, w, 3)
            y, cb, cr = je.rgb_to_ycc(imgx)
            if stage == "ycc":
                return feed(y + cb + cr, cs)
            y = je._pad_edge(y, yhb * 8, imcu_w)
            cb = je._pad_edge(cb, group_h, imcu_w)
            cr = je._pad_edge(cr, group_h, imcu_w)
            cb = je.downsample_h2v2(cb)
            cr = je.downsample_h2v2(cr)
            if stage == "downsample":
                # keep all three component computations live
                alive = (jnp.min(y) + jnp.min(cb) + jnp.min(cr)
                         + jnp.zeros((1, 1), jnp.int32))
                return feed(alive, cs)
            cb = je._pad_edge(cb, chb * 8, cwb * 8)
            cr = je._pad_edge(cr, chb * 8, cwb * 8)
            out = [
                je.fdct_quantize(y[..., :, : ywb * 8], enc_qt[0]),
                je.fdct_quantize(cb, enc_qt[1]),
                je.fdct_quantize(cr, enc_qt[2]),
            ]
            return [c + (jnp.min(out[0]) >> 15).astype(jnp.int16)
                    for c in out]

        @jax.jit
        def chained(cs, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), cs)
            return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    for stage in ("decode", "blur", "ycc", "downsample", "full"):
        per = measure(stage_fn(stage), comp_batches, passes)
        results[f"{stage}_ms_per_pass"] = round(per * 1e3, 3)
        log(f"{stage:12s} {per*1e3:8.2f} ms/pass")

    # Variant A: optimization_barrier between the filter output and the
    # encoder — stops XLA from fusing/recomputing across the seam.
    def one_barrier(cs):
        rows = jd.decode_planes(geo, cs, qts, layout="rows")
        rows = pipe.apply_rows(rows, 3, use_pallas=on_tpu, alias=on_tpu)
        rows = lax.optimization_barrier(rows)
        out = je.encode_planes(enc_geo, rows.reshape(rows.shape[0], h, w, 3),
                               enc_qt)
        z = ((jnp.min(out[0]) + jnp.min(out[1]) + jnp.min(out[2]))
             >> 15).astype(jnp.int16)  # all components live
        return [c + z for c in cs]

    @jax.jit
    def chained_barrier(cs, r):
        out = lax.fori_loop(0, r, lambda i, x: one_barrier(x), cs)
        return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                   for a in out)

    per = measure(jax.jit(chained_barrier, static_argnames="r"),
                  comp_batches, passes)
    results["full_barrier_ms_per_pass"] = round(per * 1e3, 3)
    log(f"{'full_barrier':12s} {per*1e3:8.2f} ms/pass")

    # Variant B: encode alone from in-HBM uint8 rows (what the encoder
    # segment costs when NOT composed under the decoder).
    rows_batch = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (num_images, h, w * 3), dtype=np.uint8
        )
    )

    def one_enc(rows):
        out = je.encode_planes(enc_geo, rows.reshape(rows.shape[0], h, w, 3),
                               enc_qt)
        z = ((jnp.min(out[0]) + jnp.min(out[1]) + jnp.min(out[2]))
             >> 15).astype(jnp.uint8)  # all components live
        return rows + z

    @jax.jit
    def chained_enc(rows, r):
        out = lax.fori_loop(0, r, lambda i, x: one_enc(x), rows)
        return jnp.sum(out[::97, ::3, ::5].astype(jnp.int32))

    per = measure(jax.jit(chained_enc, static_argnames="r"),
                  rows_batch, passes)
    results["enc_from_rows_ms_per_pass"] = round(per * 1e3, 3)
    log(f"{'enc_from_rows':12s} {per*1e3:8.2f} ms/pass")

    # Variant C: barriers at BOTH seams (decode->filter and
    # filter->encode).
    def one_barrier2(cs):
        rows = jd.decode_planes(geo, cs, qts, layout="rows")
        rows = lax.optimization_barrier(rows)
        rows = pipe.apply_rows(rows, 3, use_pallas=on_tpu, alias=on_tpu)
        rows = lax.optimization_barrier(rows)
        out = je.encode_planes(enc_geo, rows.reshape(rows.shape[0], h, w, 3),
                               enc_qt)
        z = ((jnp.min(out[0]) + jnp.min(out[1]) + jnp.min(out[2]))
             >> 15).astype(jnp.int16)  # all components live
        return [c + z for c in cs]

    @jax.jit
    def chained_barrier2(cs, r):
        out = lax.fori_loop(0, r, lambda i, x: one_barrier2(x), cs)
        return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                   for a in out)

    per = measure(jax.jit(chained_barrier2, static_argnames="r"),
                  comp_batches, passes)
    results["full_barrier2_ms_per_pass"] = round(per * 1e3, 3)
    log(f"{'full_barrier2':12s} {per*1e3:8.2f} ms/pass")

    # Variant D: decode alone with a trailing barrier + aliased blur (is
    # the decode->filter seam also paying a fusion penalty?)
    def one_blur_barrier(cs):
        rows = jd.decode_planes(geo, cs, qts, layout="rows")
        rows = lax.optimization_barrier(rows)
        rows = pipe.apply_rows(rows, 3, use_pallas=on_tpu, alias=on_tpu)
        z = (jnp.min(rows).astype(jnp.int16) >> 9)
        return [c + z for c in cs]

    @jax.jit
    def chained_bb(cs, r):
        out = lax.fori_loop(0, r, lambda i, x: one_blur_barrier(x), cs)
        return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                   for a in out)

    per = measure(jax.jit(chained_bb, static_argnames="r"),
                  comp_batches, passes)
    results["blur_barrier_ms_per_pass"] = round(per * 1e3, 3)
    log(f"{'blur_barrier':12s} {per*1e3:8.2f} ms/pass")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
