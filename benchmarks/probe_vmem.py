"""Probe: larger aliased blocks via a raised scoped-VMEM limit.

The aliased MXU blur OOM'd at block k=75 against Mosaic's default 16 MB
scoped-VMEM cap (probe_hbm round 2). v5e has 128 MB VMEM per core;
`pltpu.CompilerParams(vmem_limit_bytes=...)` raises the cap, potentially
unlocking bigger blocks (fewer grid steps, longer DMA bursts) past the
measured 630-820 GB/s. Each candidate is verified bit-exact before timing.

Run serially on the real chip: python benchmarks/probe_vmem.py
Results land in benchmarks/probe_vmem.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_IMAGES = 5000
PASSES = 10
REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.ops import blur as xblur
    from hipe_tpu.ops import pallas_blur as pb
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.utils.images import DEFAULT_IMAGE_256, hwc_to_planar

    img = decode_file(DEFAULT_IMAGE_256)
    h, w, c = img.shape
    n = NUM_IMAGES * c
    planes = jnp.asarray(hwc_to_planar(img[None]))

    @jax.jit
    def materialize(p):
        return jnp.broadcast_to(p[None], (NUM_IMAGES, c, h, w)).reshape(n, h, w)

    stream = materialize(planes)
    np.asarray(stream[0, 0, :4])
    want = hwc_to_planar(oracle.gaussian_blur_int_oracle(img, 1)[None])

    taps, _ = xblur.binomial_taps(1)
    band = jnp.asarray(pb._band_matrix_np(w, 1), jnp.bfloat16)
    kernel = functools.partial(pb._blur_mxu_kernel, taps=taps, h_pad=True)

    def make(k, vmem_mb):
        params = (
            pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
            if vmem_mb else None
        )
        call = pl.pallas_call(
            kernel,
            grid=(n // k,),
            in_specs=[
                pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            input_output_aliases={0: 0},
            **({"compiler_params": params} if params else {}),
        )
        return lambda x: call(x, band)

    cases = [(40, None), (75, 32), (100, 48), (120, 64), (125, 64),
             (200, 96), (250, 110)]
    results = {}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_vmem.json")
    for k, vmem_mb in cases:
        label = f"k{k}" + (f"_vmem{vmem_mb}M" if vmem_mb else "")
        try:
            fn = make(k, vmem_mb)

            @functools.partial(jax.jit, static_argnames="r")
            def chained(s, r, fn=fn):
                out = lax.fori_loop(0, r, lambda i, x: fn(x), s)
                return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

            got = np.asarray(jax.jit(lambda s, fn=fn: fn(s)[:c])(stream))
            err = int(np.max(np.abs(got.astype(int) - want.astype(int))))
            assert err == 0, (label, err)

            float(np.asarray(chained(stream, 1)))
            float(np.asarray(chained(stream, 1 + PASSES)))
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(chained(stream, 1)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(np.asarray(chained(stream, 1 + PASSES)))
                t2 = time.perf_counter() - t0
                best = min(best, (t2 - t1) / PASSES)
            gbs = 2 * n * h * w / best / 1e9
            results[label] = {
                "per_pass_ms": round(best * 1e3, 3),
                "hbm_gb_per_s": round(gbs, 1),
                "img_per_s": round(NUM_IMAGES / best),
            }
            log(f"{label:16s} {best * 1e3:7.2f} ms  {gbs:7.1f} GB/s  "
                f"{NUM_IMAGES / best:12,.0f} img/s")
        except Exception as e:  # noqa: BLE001
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{label:16s} FAILED: {type(e).__name__}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
