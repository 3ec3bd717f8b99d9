"""Probe: does the device-side coefficient transpose cost the missing 10 ms?

probe_dct/probe_assembly segments (planes fed pre-transposed) sum to
~29.5 ms/pass while the full decode chain measures ~39.5 ms. The suspect
is `_dequant_planes`' swapaxes: (B, Hb*Wb, 64) -> (B, 64, Hb*Wb), a
lane-axis transpose of the whole int16 coefficient volume. If the host
entropy decoder delivered (64, Hb*Wb) directly, that relayout vanishes.

Measures the full decode chain with (a) natural-layout inputs (shipped
path) and (b) pre-transposed (B, 64, n) inputs feeding the IDCT directly.

Run serially on the real TPU: python benchmarks/probe_coef_layout.py
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
    qts = [np.asarray(c.qtable) for c in co.components]
    log(f"backend={backend} {geo.height}x{geo.width}")

    natural = [
        jax.device_put(
            np.broadcast_to(c.coefs, (num_images, *c.coefs.shape)).copy()
        )
        for c in co.components
    ]
    transposed = [
        jax.device_put(
            np.broadcast_to(
                np.ascontiguousarray(
                    c.coefs.reshape(-1, 64).T  # (64, Hb*Wb)
                ),
                (num_images, 64, c.coefs.shape[0] * c.coefs.shape[1]),
            ).copy()
        )
        for c in co.components
    ]
    ns = [c.coefs.shape[0] * c.coefs.shape[1] for c in co.components]

    results: dict = {
        "metric": "coef_layout_2000x256x256_decode",
        "backend": backend,
    }

    def feed(rows, cs):
        z = (jnp.min(rows).astype(jnp.int16) >> 9)
        return [c + z for c in cs]

    def chain_natural():
        def one(cs):
            rows = jd.decode_planes(geo, cs, qts, layout="rows")
            return feed(rows, cs)

        @jax.jit
        def chained(cs, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), cs)
            return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    def chain_pre_t():
        # Same decode but planes sliced straight from (B, 64, n) inputs;
        # the three components still share one concatenated IDCT graph.
        def one(cs):
            cat = [
                jnp.concatenate(
                    [cs[ci][:, k, :].astype(jnp.int32) * int(qts[ci][k])
                     for ci in range(3)],
                    axis=-1,
                )
                for k in range(64)
            ]
            out = jd._idct_planes_core(cat)
            y_p = [o[..., : ns[0]] for o in out]
            cb_p = [o[..., ns[0]: ns[0] + ns[1]] for o in out]
            cr_p = [o[..., ns[0] + ns[1]:] for o in out]
            rows = jd._decode_rgb_rows_from_planes(geo, y_p, cb_p, cr_p)
            return feed(rows, cs)

        @jax.jit
        def chained(cs, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), cs)
            return sum(jnp.sum(a[::97, ::3, ::5].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    # exactness gate
    want = np.asarray(jd.decode_planes(
        geo, [c[:2] for c in natural], qts, layout="rows"))
    cat2 = [
        jnp.concatenate(
            [transposed[ci][:2, k, :].astype(jnp.int32) * int(qts[ci][k])
             for ci in range(3)], axis=-1)
        for k in range(64)
    ]
    out2 = jd._idct_planes_core(cat2)
    got = np.asarray(jd._decode_rgb_rows_from_planes(
        geo,
        [o[..., : ns[0]] for o in out2],
        [o[..., ns[0]: ns[0] + ns[1]] for o in out2],
        [o[..., ns[0] + ns[1]:] for o in out2],
    ))
    err = int(np.abs(got.astype(int) - want.astype(int)).max())
    results["pre_t_max_abs_err"] = err
    log(f"pre-transposed path max_abs_err: {err}")

    per = measure(chain_natural(), natural, passes)
    results["natural_ms_per_pass"] = round(per * 1e3, 3)
    log(f"natural (HbWb64)   {per*1e3:8.2f} ms/pass "
        f"({num_images/per:,.0f} img/s)")

    per = measure(chain_pre_t(), transposed, passes)
    results["pre_t_ms_per_pass"] = round(per * 1e3, 3)
    log(f"pre-transposed     {per*1e3:8.2f} ms/pass "
        f"({num_images/per:,.0f} img/s)")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
