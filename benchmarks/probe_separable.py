"""Probe: MXU-banded W pass for *separable* registered kernels.

Registered convolution kernels (PIL ImageFilter.Kernel semantics) run on
the generic fused VPU chain path — (2r+1)^2 shifted adds per pixel. A
separable kernel (taps == outer(u, v)) factors into a W-axis pass (a
clamp-folded banded matmul — the same machinery the blur/sharpen/edge
chain uses on the MXU, here with int8 or bf16 bands) and an H-axis pass
(clamped rolls with the u taps), followed by the stage's exact
reciprocal-multiply division:

    acc(i,j) = sum_dy u'[dy] * sum_dx v[dx] * x[clamp(i+dy-r), clamp(j+dx-r)]
    out      = clip(floor((2*acc + scale*(off2+1)) / (2*scale)))

(u' is u flipped — register_kernel_filter stores rows[::-1].) Bit-exact
vs the registered stage by the usual contracts (int8 dot: exact integer
arithmetic; bf16 band: folded entries checked exactly representable,
fp32 accumulation < 2^24). Asserted per variant before timing.

Adopt only if measured faster (the sharpen/edge VPU-vs-MXU probes cut
both ways); commit the JSON either way.

Run serially on the real chip: python benchmarks/probe_separable.py
Results land in benchmarks/probe_separable.json.
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

# (name, u, v, scale, offset): separable test kernels — the 3x3 binomial
# a user would register as "soft", a 5x5 box, an asymmetric gradient
# (exercises band orientation), and a 7x7 binomial (49-tap VPU unroll vs
# one dot + 7 rolls).
SEP_KERNELS = [
    ("sep_soft", (1, 2, 1), (1, 2, 1), 16, 0),
    ("sep_box5", (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), 25, 0),
    ("sep_grad", (1, 2, 1), (1, 0, -1), 1, 128),
    ("sep_binom7", (1, 6, 15, 20, 15, 6, 1), (1, 6, 15, 20, 15, 6, 1),
     4096, 0),
]


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

    # Off-TPU the probe still smoke-runs (interpret-mode kernels, tiny
    # stream) so the formulation is testable without the tunnel.
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

    for name, u, v, scale, off in SEP_KERNELS:
        taps = tuple(int(a * b) for a in u for b in v)
        xblur.register_kernel_filter(name, taps, scale, off)

    # The XLA stage is the oracle (its CPU exactness vs PIL is pinned by
    # tests/test_kernel_filters.py).
    oracles = {
        name: np.asarray(
            jax.jit(lambda s, nm=name: xblur.filter_chain(
                s, (nm,), h_axis=1, w_axis=2)[:c])(stream))
        for name, *_ in SEP_KERNELS
    }

    def make_mxu_sep(name, u, v, scale, off, k, int8):
        r = len(u) // 2
        u_flipped = tuple(u[::-1])
        colsum = sum(v)
        band_np = pb._band_from_taps_np(w, tuple(v), 1.0, 1)
        if int8:
            assert np.abs(band_np).max() <= 127, name
            band = jnp.asarray(band_np, jnp.int8)
        else:
            bf = band_np.astype(jnp.bfloat16).astype(np.float32)
            assert np.array_equal(bf, band_np), (name, "band not bf16-exact")
            band = jnp.asarray(band_np, jnp.bfloat16)
        cnum = scale * (2 * off + 1)
        den = 2 * scale

        def kernel(x_ref, b_ref, o_ref):
            x = x_ref[:].astype(jnp.int32)
            if int8:
                xc = (x - 128).astype(jnp.int8)
                t = lax.dot_general(
                    xc, b_ref[:], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if colsum:
                    t = t + 128 * colsum
            else:
                t = lax.dot_general(
                    x.astype(jnp.bfloat16), b_ref[:],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
            acc = pb._hpass_rolls(t, u_flipped)
            num = 2 * acc + cnum
            out = jnp.clip(xblur._floordiv_exact(num, den), 0, 255)
            o_ref[:] = out.astype(jnp.uint8)

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
            input_output_aliases={} if interpret else {0: 0},
            interpret=interpret,
            **pb._compiler_params(None),
        )
        return lambda x: call(x, band)

    variants = {}
    for name, u, v, scale, off in SEP_KERNELS:
        variants[f"{name}_vpu_k24"] = (name, lambda s, nm=name:
            pb.filter_chain_planar_pallas(
                s, (nm,), alias=not interpret, interpret=interpret,
                block_planes=24 if not interpret else None))
        for k in ((24, 50) if not interpret else (n,)):
            variants[f"{name}_mxu_i8_k{k}"] = (
                name, make_mxu_sep(name, u, v, scale, off, k, True))
        kb = 24 if not interpret else n
        variants[f"{name}_mxu_bf16_k{kb}"] = (
            name, make_mxu_sep(name, u, v, scale, off, kb, False))

    results = {}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_separable.json")
    for label, (name, fn) in variants.items():
        try:
            @functools.partial(jax.jit, static_argnames="r")
            def chained(s, r, fn=fn):
                out = lax.fori_loop(0, r, lambda i, x: fn(x), s)
                return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

            got = np.asarray(jax.jit(lambda s, fn=fn: fn(s)[:c])(stream))
            err = int(np.max(np.abs(got.astype(int)
                                    - oracles[name].astype(int))))
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
            log(f"{label:26s} {per_pass * 1e3:7.2f} ms "
                f"{num_images / per_pass:12,.0f} img/s")
        except Exception as e:  # noqa: BLE001 — failures are probe results
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{label:26s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
