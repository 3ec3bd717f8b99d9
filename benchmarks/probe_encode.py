"""Probe: encoder hot-path variants on the real TPU.

The honest encode-from-rows cost is ~24.8 ms/pass (probe_transcode.json):
ycc 1.2, chroma downsample ~10.8, fDCT+quantize+plane-extraction ~15 ms.
Variants measured here:

  enc_baseline   — encode_planes as shipped
  extract_slices — _planes_from_grid via 64 strided (r, c) slices (the
                   round-1 formulation)
  extract_transp — plane extraction via one 5-D transpose to (B, 64, n)
                   then 64 sublane slices

Run serially on the real TPU: python benchmarks/probe_encode.py
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
    from hipe_tpu.ops import jpeg_encode as je
    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    num_images = 2000 if on_tpu else 8
    passes = 8 if on_tpu else 2
    h = w = 256

    enc_geo = je.encode_geometry(h, w, 3, "420")
    luma, chroma = jpeg.quality_tables(90)
    enc_qt = [luma, chroma, chroma]
    log(f"backend={backend} {h}x{w}")

    rows_batch = jax.device_put(
        np.random.default_rng(0).integers(
            0, 256, (num_images, h, w * 3), dtype=np.uint8
        )
    )

    results: dict = {
        "metric": "encode_variants_2000x256x256_q90_h2v2",
        "backend": backend,
    }

    def feed_all(out, rows):
        z = ((jnp.min(out[0]) + jnp.min(out[1]) + jnp.min(out[2]))
             >> 15).astype(jnp.uint8)
        return rows + z

    def run_chain(name, one):
        @jax.jit
        def chained(rows, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), rows)
            return jnp.sum(out[::97, ::3, ::5].astype(jnp.int32))

        per = measure(jax.jit(chained, static_argnames="r"),
                      rows_batch, passes)
        results[f"{name}_ms_per_pass"] = round(per * 1e3, 3)
        log(f"{name:16s} {per*1e3:8.2f} ms/pass "
            f"({num_images/per:,.0f} img/s)")

    # Baseline: shipped encode_planes.
    def one_base(rows):
        out = je.encode_planes(
            enc_geo, rows.reshape(rows.shape[0], h, w, 3), enc_qt
        )
        return feed_all(out, rows)

    run_chain("enc_baseline", one_base)

    # fdct_quantize with plane extraction via one 5-D transpose.
    def fdct_transpose(plane, qtable):
        bshape = plane.shape[:-2]
        hb, wb = plane.shape[-2] // 8, plane.shape[-1] // 8
        x = plane.astype(jnp.int32) - 128
        xt = x.reshape(*bshape, hb, 8, wb, 8)
        nd = xt.ndim
        # (..., hb, r, wb, c) -> (..., r, c, hb, wb): one transpose, then
        # each plane is a sublane-axis slice (not a lane-strided gather).
        perm = tuple(range(nd - 4)) + (nd - 3, nd - 1, nd - 4, nd - 2)
        xt = xt.transpose(perm).reshape(*bshape, 64, hb * wb)
        planes = [xt[..., k, :] for k in range(64)]
        ws = [None] * 64
        for r in range(8):
            row = je._fdct_1d([planes[r * 8 + c] for c in range(8)],
                              final=False)
            for c in range(8):
                ws[r * 8 + c] = row[c]
        out = [None] * 64
        for c in range(8):
            col = je._fdct_1d([ws[r * 8 + c] for r in range(8)], final=True)
            for r in range(8):
                out[r * 8 + c] = col[r]
        q = np.asarray(qtable, dtype=np.int64)
        coefs = []
        for k in range(64):
            qd = int(q[k]) << 3
            t = out[k]
            a = jnp.abs(t) + (qd >> 1)
            v = a // qd
            coefs.append(jnp.where(t < 0, -v, v).astype(jnp.int16))
        stacked = jnp.stack(coefs, axis=-1)
        return stacked.reshape(*stacked.shape[:-2], hb, wb, 64)

    def one_transp(rows):
        img = rows.reshape(rows.shape[0], h, w, 3)
        y, cb, cr = je.rgb_to_ycc(img)
        _, _, ywb, yhb = enc_geo.comps[0]
        _, _, cwb, chb = enc_geo.comps[1]
        imcu_w = 16 * -(-w // 16)
        y = je._pad_edge(y, yhb * 8, imcu_w)
        cb = je._pad_edge(cb, 2 * -(-h // 2), imcu_w)
        cr = je._pad_edge(cr, 2 * -(-h // 2), imcu_w)
        cb = je.downsample_h2v2(cb)
        cr = je.downsample_h2v2(cr)
        cb = je._pad_edge(cb, chb * 8, cwb * 8)
        cr = je._pad_edge(cr, chb * 8, cwb * 8)
        out = [
            fdct_transpose(y[..., :, : ywb * 8], enc_qt[0]),
            fdct_transpose(cb, enc_qt[1]),
            fdct_transpose(cr, enc_qt[2]),
        ]
        return feed_all(out, rows)

    # correctness gate for the transpose variant
    small = np.asarray(rows_batch[:2])
    want = [np.asarray(x) for x in je.encode_planes(
        enc_geo, jnp.asarray(small.reshape(2, h, w, 3)), enc_qt)]
    img2 = jnp.asarray(small.reshape(2, h, w, 3))
    y2, cb2, cr2 = je.rgb_to_ycc(img2)
    _, _, ywb, yhb = enc_geo.comps[0]
    _, _, cwb, chb = enc_geo.comps[1]
    imcu_w = 16 * -(-w // 16)
    y2 = je._pad_edge(y2, yhb * 8, imcu_w)
    cb2 = je._pad_edge(cb2, 2 * -(-h // 2), imcu_w)
    cr2 = je._pad_edge(cr2, 2 * -(-h // 2), imcu_w)
    cb2 = je.downsample_h2v2(cb2)
    cr2 = je.downsample_h2v2(cr2)
    cb2 = je._pad_edge(cb2, chb * 8, cwb * 8)
    cr2 = je._pad_edge(cr2, chb * 8, cwb * 8)
    got = [np.asarray(fdct_transpose(y2[..., :, : ywb * 8], enc_qt[0])),
           np.asarray(fdct_transpose(cb2, enc_qt[1])),
           np.asarray(fdct_transpose(cr2, enc_qt[2]))]
    err = max(int(np.abs(g.astype(int) - w_.astype(int)).max())
              for g, w_ in zip(got, want))
    results["transpose_max_abs_err"] = err
    log(f"transpose extraction max_abs_err: {err}")

    run_chain("enc_transpose", one_transp)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
