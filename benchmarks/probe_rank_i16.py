"""Probe: int16 min/max sort networks for the nonlinear rank kernels.

median/median5/erode/dilate are the pipelines furthest below the DMA
ceiling (median: 17.6 ms/pass, ~112 GB/s vs ~650 for blur3) — they are
VPU-bound on int32 compare-exchange networks (median: Paeth's 19-op
min/max net; median5: a 25-wide odd-even network). Values are [0, 255],
so the whole network fits int16 — if Mosaic vectorizes int16 min/max at
2 elements/lane, the network halves in VPU issue. Known Mosaic int16
limits (CLAUDE.md: no `2*x` / `>>` on int16) don't apply: the network is
pure minimum/maximum; casts route uint8 -> int32 -> int16 and back.

Variants per stage: the production int32 fused kernel vs an int16-network
kernel, both aliased, exactness-gated against the XLA stage. A compile
failure (Mosaic rejecting int16 min/max or the casts) is a recorded
result, not an error.

Run serially on the real chip: python benchmarks/probe_rank_i16.py
Results land in benchmarks/probe_rank_i16.json.
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
    from hipe_tpu.utils.images import DEFAULT_IMAGE_256, hwc_to_planar

    on_tpu = jax.default_backend() != "cpu"
    interpret = not on_tpu
    num_images = NUM_IMAGES if on_tpu else 4

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

    STAGES = ("median", "median5", "erode", "dilate")
    oracles = {
        nm: np.asarray(jax.jit(lambda s, nm=nm: xblur.filter_chain(
            s, (nm,), h_axis=1, w_axis=2)[:c])(stream))
        for nm in STAGES
    }

    def _median_of_9_i16(vals):
        mn, mx = jnp.minimum, jnp.maximum

        def sort3(a, b, c_):
            tl, th = mn(a, b), mx(a, b)
            return mn(tl, c_), mx(tl, mn(th, c_)), mx(th, c_)

        def med3(a, b, c_):
            return mx(mn(a, b), mn(mx(a, b), c_))

        t = [sort3(*vals[i:i + 3]) for i in (0, 3, 6)]
        lo = mx(mx(t[0][0], t[1][0]), t[2][0])
        me = med3(t[0][1], t[1][1], t[2][1])
        hi = mn(mn(t[0][2], t[1][2]), t[2][2])
        return med3(lo, me, hi)

    def make_i16(name, k):
        from hipe_tpu.ops.blur import RANK_STAGES

        def stencil(xi, r):
            # The production _stencil_r view construction (edge-pad +
            # slices), on int16 instead of int32.
            kk, hh, ww = xi.shape
            xp = jnp.concatenate(
                [jnp.broadcast_to(xi[:, :, :1], (kk, hh, r)), xi,
                 jnp.broadcast_to(xi[:, :, -1:], (kk, hh, r))], axis=2)
            xp = jnp.concatenate(
                [jnp.broadcast_to(xp[:, :1, :], (kk, r, ww + 2 * r)), xp,
                 jnp.broadcast_to(xp[:, -1:, :], (kk, r, ww + 2 * r))],
                axis=1)

            def view(dy, dx):
                v1 = lax.slice_in_dim(xp, dy, dy + hh, axis=1)
                return lax.slice_in_dim(v1, dx, dx + ww, axis=2)

            return view

        def kernel(x_ref, o_ref):
            # uint8 -> int32 -> int16 (Mosaic has no direct uint8<->int16
            # cast path); the network itself is pure min/max on int16.
            x = x_ref[:].astype(jnp.int32).astype(jnp.int16)
            if name == "median":
                v = stencil(x, 1)
                out = _median_of_9_i16(
                    [v(dy, dx) for dy in range(3) for dx in range(3)])
            elif name in ("erode", "dilate"):
                red = jnp.minimum if name == "erode" else jnp.maximum
                v = stencil(x, 1)
                out = functools.reduce(
                    red, [v(dy, dx) for dy in range(3) for dx in range(3)]
                )
            else:
                size, rank = RANK_STAGES[name]
                v = stencil(x, size // 2)
                out = xblur._rank_select(
                    [v(dy, dx) for dy in range(size) for dx in range(size)],
                    rank)
            o_ref[:] = out.astype(jnp.int32).astype(jnp.uint8)

        call = pl.pallas_call(
            kernel,
            grid=(n // k,),
            in_specs=[pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            input_output_aliases={} if interpret else {0: 0},
            interpret=interpret,
            **pb._compiler_params(None),
        )
        return call

    variants = {}
    for nm in STAGES:
        variants[f"{nm}_i32_prod"] = (nm, lambda s, nm=nm:
            pb.filter_chain_planar_pallas(
                s, (nm,), alias=not interpret, interpret=interpret))
        for k in ((8, 16) if not interpret else (n,)):
            variants[f"{nm}_i16_k{k}"] = (nm, make_i16(nm, k))

    results = {}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_rank_i16.json")
    for label, (nm, fn) in variants.items():
        try:
            @functools.partial(jax.jit, static_argnames="r")
            def chained(s, r, fn=fn):
                out = lax.fori_loop(0, r, lambda i, x: fn(x), s)
                return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

            got = np.asarray(jax.jit(lambda s, fn=fn: fn(s)[:c])(stream))
            err = int(np.max(np.abs(got.astype(int)
                                    - oracles[nm].astype(int))))
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
            log(f"{label:22s} {per_pass * 1e3:7.2f} ms "
                f"{num_images / per_pass:12,.0f} img/s")
        except Exception as e:  # noqa: BLE001 — failures are probe results
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{label:22s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
