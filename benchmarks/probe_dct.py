"""Probe: fused Pallas dequant+IDCT / fDCT+quantize vs the XLA plane graph.

The XLA islow DCT is an unrolled graph over 64 block-position planes; each
1-D pass is an 8->8 all-to-all over planes, so XLA materializes the pass
intermediates in HBM (int32). The Pallas kernels (ops/pallas_dct.py) keep
both passes VMEM-resident. This probe measures the isolated DCT segment
(coefficients -> uint8 sample planes, and back) both ways on the real TPU
with chained pass-count differencing, sweeping the kernel batch-block size.

Run serially on the real TPU: python benchmarks/probe_dct.py
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
    from hipe_tpu.ops import pallas_dct as pd
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
    qt = np.asarray(co.components[0].qtable)
    ycoefs = co.components[0].coefs  # (32, 32, 64) int16 for 256x256
    batch = jax.device_put(
        np.broadcast_to(ycoefs, (num_images, *ycoefs.shape)).copy()
    )
    log(f"backend={backend} Y coefs {batch.shape}")

    results: dict = {"metric": "dct_segment_2000x256x256_Y", "backend": backend}

    # exactness gate on this backend
    want = jd._idct_planes_core(jd._dequant_planes(batch[:2], qt))
    got = pd.dequant_idct_planes_pallas(batch[:2], qt, interpret=not on_tpu)
    err = max(
        int(np.abs(np.asarray(g).astype(int)
                   - np.asarray(w).reshape(2, -1).astype(int)).max())
        for g, w in zip(got, want)
    )
    results["idct_max_abs_err"] = err
    log(f"pallas idct max_abs_err vs XLA: {err}")

    def chain_xla():
        def one(c):
            planes = jd._idct_planes_core(jd._dequant_planes(c, qt))
            s = jnp.stack(planes, axis=1)  # (B, 64, n) uint8
            z = (jnp.min(s).astype(jnp.int16) >> 9)
            return c + z

        @jax.jit
        def chained(c, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), c)
            return jnp.sum(out[::97, ::3, ::5, ::7].astype(jnp.int32))

        return jax.jit(chained, static_argnames="r")

    def chain_pallas(block_b: int):
        def one(c):
            planes = pd.dequant_idct_planes_pallas(
                c, qt, block_b=block_b, interpret=not on_tpu
            )
            s = jnp.stack(planes, axis=1)
            z = (jnp.min(s).astype(jnp.int16) >> 9)
            return c + z

        @jax.jit
        def chained(c, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), c)
            return jnp.sum(out[::97, ::3, ::5, ::7].astype(jnp.int32))

        return jax.jit(chained, static_argnames="r")

    per = measure(chain_xla(), batch, passes)
    results["xla_ms_per_pass"] = round(per * 1e3, 3)
    log(f"xla dequant+idct      {per*1e3:8.2f} ms/pass "
        f"({num_images/per:,.0f} img/s)")

    for block_b in (2, 4):
        per = measure(chain_pallas(block_b), batch, passes)
        results[f"pallas_b{block_b}_ms_per_pass"] = round(per * 1e3, 3)
        log(f"pallas idct b={block_b:<3d}     {per*1e3:8.2f} ms/pass "
            f"({num_images/per:,.0f} img/s)")

    # ---- where does the rest of the decode pass go? Segment the full
    # decode: (a) dequant+IDCT all components, (b) planes -> rows
    # (phase-fused upsample/color/assembly), (c) full decode_planes.
    geo = jd.geometry_of(co)
    qts = [np.asarray(c.qtable) for c in co.components]
    comp_batches = [
        jax.device_put(
            np.broadcast_to(c.coefs, (num_images, *c.coefs.shape)).copy()
        )
        for c in co.components
    ]

    def chain_all_idct():
        def one(cs):
            outs = []
            for ci in range(3):
                planes = jd._idct_planes_core(
                    jd._dequant_planes(cs[ci], qts[ci])
                )
                outs.append(jnp.stack(planes, axis=1))
            z = (jnp.min(outs[0]).astype(jnp.int16) >> 9)
            return [c + z for c in cs]

        @jax.jit
        def chained(cs, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), cs)
            return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    def chain_assembly():
        # Inputs: materialized uint8 plane stacks (B, 64, n_i); each pass
        # runs only planes -> rows.
        def one(stacks):
            comp_planes = [
                [stacks[ci][:, p, :] for p in range(64)] for ci in range(3)
            ]
            rows = jd._decode_rgb_rows_from_planes(geo, *comp_planes)
            z = (jnp.min(rows).astype(jnp.int32) >> 9).astype(jnp.uint8)
            return [s + z for s in stacks]

        @jax.jit
        def chained(stacks, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), stacks)
            return sum(jnp.sum(a[::97, ::3, ::5].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    def chain_full():
        def one(cs):
            rows = jd.decode_planes(geo, cs, qts, layout="rows")
            z = (jnp.min(rows).astype(jnp.int16) >> 9)
            return [c + z for c in cs]

        @jax.jit
        def chained(cs, r):
            out = lax.fori_loop(0, r, lambda i, x: one(x), cs)
            return sum(jnp.sum(a[::97, ::3, ::5, ::7].astype(jnp.int32))
                       for a in out)

        return jax.jit(chained, static_argnames="r")

    per = measure(chain_all_idct(), comp_batches, passes)
    results["idct_all_comps_ms_per_pass"] = round(per * 1e3, 3)
    log(f"idct all comps        {per*1e3:8.2f} ms/pass")

    stacks = [
        jax.device_put(
            np.zeros((num_images, 64, c.coefs.shape[0] * c.coefs.shape[1]),
                     dtype=np.uint8)
        )
        for c in co.components
    ]
    per = measure(chain_assembly(), stacks, passes)
    results["assembly_ms_per_pass"] = round(per * 1e3, 3)
    log(f"planes->rows          {per*1e3:8.2f} ms/pass")

    per = measure(chain_full(), comp_batches, passes)
    results["full_decode_ms_per_pass"] = round(per * 1e3, 3)
    log(f"full decode           {per*1e3:8.2f} ms/pass "
        f"({num_images/per:,.0f} img/s)")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
