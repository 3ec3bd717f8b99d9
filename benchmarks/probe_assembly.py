"""Probe: where the decode assembly stage (planes -> rows) spends its time.

probe_dct.py showed the phase-fused upsample/color/assembly stage is ~61%
of the device decode pass (24 of 39.5 ms per 2000x256x256 stream) while
the dequant+IDCT is only 5.4 ms. This probe splits the stage into
segments on the real TPU:

  y_phases   — the 4 parity Y phase-grid assemblies (stack+reshape only)
  chroma     — chroma grid assembly + fancy-upsample phase math (int16)
  color      — fixed-point YCbCr->RGB on materialized phase grids (int32)
  interleave — the phase/channel interleaves into rows layout
  full       — _decode_rgb_rows_from_planes end to end

Run serially on the real TPU: python benchmarks/probe_assembly.py
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
    from hipe_tpu.ops import jpeg_decode as jd
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
    log(f"backend={backend} {geo.height}x{geo.width} h2v2")

    # Materialized uint8 plane stacks, the assembly stage's inputs.
    stacks = [
        jax.device_put(
            np.random.default_rng(i).integers(
                0, 256,
                (num_images, 64, c.coefs.shape[0] * c.coefs.shape[1]),
                dtype=np.uint8,
            )
        )
        for i, c in enumerate(co.components)
    ]
    _, _, ywb, yhb = geo.comps[0]
    _, _, cwb, chb = geo.comps[1]
    dh, dw = jd._downsampled_dims(geo, 1)

    results: dict = {
        "metric": "decode_assembly_segments_2000x256x256",
        "backend": backend,
    }

    def planes_of(stack):
        return [stack[:, p, :] for p in range(64)]

    def run_chain(name, one):
        @jax.jit
        def chained(sts, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), sts)
            return sum(jnp.sum(a[::97, ::3, ::5].astype(jnp.int32))
                       for a in out)

        fn = jax.jit(chained, static_argnames="r")
        per = measure(fn, stacks, passes)
        results[f"{name}_ms_per_pass"] = round(per * 1e3, 3)
        log(f"{name:12s} {per*1e3:8.2f} ms/pass")
        return per

    # 1. Y phase grids only.
    def one_y(sts):
        yp = planes_of(sts[0])
        acc = None
        for pr in (0, 1):
            for pc in (0, 1):
                g = jd._grid_from_planes(
                    yp, yhb, ywb, range(pr, 8, 2), range(pc, 8, 2)
                )[..., :dh, :dw]
                acc = g if acc is None else acc + g
        z = (jnp.min(acc) >> 9).astype(jnp.uint8)
        return [s + z for s in sts]

    run_chain("y_phases", one_y)

    # 2. chroma grid + upsample phase math (no color, no interleave).
    def one_chroma(sts):
        cb = jd._grid_from_planes(planes_of(sts[1]), chb, cwb,
                                  range(8), range(8))[..., :dh, :dw]
        cr = jd._grid_from_planes(planes_of(sts[2]), chb, cwb,
                                  range(8), range(8))[..., :dh, :dw]
        cb = cb.astype(jnp.int16)
        cr = cr.astype(jnp.int16)
        acc = None
        for voff in (-1, 1):
            for c in (cb, cr):
                cs = 3 * c + jd._clamp_rows(c, voff)
                left = jd._clamp_cols(cs, -1)
                right = jd._clamp_cols(cs, 1)
                e = (3 * cs + left + 8) >> 4
                o = (3 * cs + right + 7) >> 4
                acc = e + o if acc is None else acc + e + o
        z = (jnp.min(acc) >> 9).astype(jnp.uint8)
        return [s + z for s in sts]

    run_chain("chroma_up", one_chroma)

    # 3. color conversion (incl. channel interleave) on phase-grid-shaped
    # stand-ins: 4 phases of (B, dh, dw), as the real path runs.
    def one_color(sts):
        y = sts[0].reshape(num_images, -1)[:, : dh * dw]
        y = y.reshape(num_images, dh, dw)
        # chroma stacks hold exactly dh*dw bytes (h2v2): reshape to the
        # upsampled phase-grid shape the real color stage consumes.
        cb = sts[1].reshape(num_images, dh, dw).astype(jnp.int16)
        cr = sts[2].reshape(num_images, dh, dw).astype(jnp.int16)
        acc = None
        for _ in range(4):
            rgb = jd._rgb_rows(y, cb, cr)
            acc = rgb if acc is None else acc + rgb
        z = (jnp.min(acc) >> 9).astype(jnp.uint8)
        return [s + z for s in sts]

    run_chain("color4x", one_color)

    # 4. full assembly.
    def one_full(sts):
        rows = jd._decode_rgb_rows_from_planes(
            geo, planes_of(sts[0]), planes_of(sts[1]), planes_of(sts[2])
        )
        z = (jnp.min(rows) >> 9).astype(jnp.uint8)
        return [s + z for s in sts]

    run_chain("full", one_full)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
