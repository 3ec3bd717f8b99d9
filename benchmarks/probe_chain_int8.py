"""Probe: int8 MXU bands for the fused chain (and single band stages).

The chain is the one pipeline well below the DMA ceiling (~158 GB/s vs
~650 for blur3 — device_stream_v5e.json): it is compute-bound on 4 dense
bf16 x bf16 -> fp32 banded matmuls per block. v5e's MXU runs
int8 x int8 -> int32 at twice the bf16 rate and every band weight is a
small exact integer, so `filter_chain_planar_pallas(int8_bands=True)`
reformulates the W passes as centered int8 dots + integer H passes +
`>> 4r` normalization — bit-identical by the repo's exactness contract
(asserted per variant here AND in tests/test_pallas_kernels.py interpret
mode).

Adopt only if measured faster; commit the JSON either way (the same
discipline as probe_chain.py, which measured the VPU-W rebalance slower
and settled the bf16 stage mix).

Run serially on the real chip: python benchmarks/probe_chain_int8.py
Results land in benchmarks/probe_chain_int8.json.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_IMAGES = 5000
PASSES = 8
REPS = 5
NAMES = ("gaussian3", "sharpen", "edge")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.ops import pallas_blur as pb
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.utils.images import DEFAULT_IMAGE_256, hwc_to_planar

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    # Off-TPU the probe smoke-runs interpret-mode kernels on a tiny
    # stream — exactness still asserted, timings meaningless.
    num_images = NUM_IMAGES if on_tpu else 40  # 120 planes: lcm of the ks
    interpret = not on_tpu

    img = decode_file(DEFAULT_IMAGE_256)
    h, w, c = img.shape
    n = num_images * c
    planes = jnp.asarray(hwc_to_planar(img[None]))

    @jax.jit
    def materialize(p):
        return jnp.broadcast_to(p[None], (num_images, c, h, w)).reshape(
            n, h, w)

    stream = materialize(planes)
    np.asarray(stream[0, 0, :4])

    oracles = {
        NAMES: hwc_to_planar(
            oracle.sobel_edge_oracle(
                oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(img))
            )[None]
        ),
        ("gaussian3",): hwc_to_planar(
            oracle.gaussian_blur_int_oracle(img)[None]),
        ("sharpen",): hwc_to_planar(oracle.sharpen3x3_oracle(img)[None]),
        ("edge",): hwc_to_planar(oracle.sobel_edge_oracle(img)[None]),
    }

    def make(names, k, int8, vmem_mb=None):
        return lambda x: pb.filter_chain_planar_pallas(
            x, names, alias=True, block_planes=k, vmem_limit_mb=vmem_mb,
            int8_bands=int8, interpret=interpret,
        )

    variants = {}
    # Chain: the committed tuned block (k=24) head-to-head, plus a small
    # block sweep for the int8 variant (its VMEM live set differs — int8
    # band + int32 dot accumulators vs bf16 band + fp32).
    for k in (12, 24, 40):
        variants[f"chain_bf16_k{k}"] = (NAMES, make(NAMES, k, False))
        variants[f"chain_int8_k{k}"] = (NAMES, make(NAMES, k, True))
    variants["chain_int8_k60_vmem48M"] = (NAMES, make(NAMES, 60, True, 48))
    # Single band stages: does the int8 dot pay when only one dot runs
    # per block (the blur3/sharpen/edge rows are near the DMA ceiling, so
    # little is expected — measured, not assumed)?
    for nm in ("gaussian3", "sharpen", "edge"):
        variants[f"{nm}_bf16_k24"] = ((nm,), make((nm,), 24, False))
        variants[f"{nm}_int8_k24"] = ((nm,), make((nm,), 24, True))

    results = {"backend": backend, "num_images": num_images}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_chain_int8.json")
    for label, (names, fn) in variants.items():
        try:
            @functools.partial(jax.jit, static_argnames="r")
            def chained(s, r, fn=fn):
                out = lax.fori_loop(0, r, lambda i, x: fn(x), s)
                return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

            got = np.asarray(jax.jit(lambda s, fn=fn: fn(s)[:c])(stream))
            err = int(np.max(np.abs(got.astype(int)
                                    - oracles[names].astype(int))))
            assert err == 0, (label, err)

            float(np.asarray(chained(stream, 1)))
            float(np.asarray(chained(stream, 1 + PASSES)))
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(chained(stream, 1)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(np.asarray(chained(stream, 1 + PASSES)))
                t2 = time.perf_counter() - t0
                samples.append((t2 - t1) / PASSES)
            per_pass = statistics.median(samples)
            results[label] = {
                "per_pass_ms": round(per_pass * 1e3, 3),
                "img_per_s": round(num_images / per_pass),
                "max_abs_err": err,
            }
            log(f"{label:24s} {per_pass * 1e3:7.2f} ms "
                f"{num_images / per_pass:12,.0f} img/s")
        except Exception as e:  # noqa: BLE001 — failures are probe results
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{label:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
