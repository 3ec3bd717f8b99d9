"""Probe: fused-chain stage mix — dense MXU bands vs VPU lane-rolls.

The fused chain kernel runs every stage's W pass as a dense (W x W) banded
matmul on the MXU (4 dots per block: blur, sharpen's l+r, edge's smooth
and diff). Round 1 measured a VPU rebalance slower, but that was in the
DMA-bound regime; with in-place aliasing the chain is now compute-bound
(~180 GB/s vs the 640+ ceiling), so shedding 3 of 4 dense dots may pay.
This probe times the current kernel against a variant where sharpen/edge
W passes are clamp-mode `pltpu.roll` lane shifts (blur keeps the MXU),
both aliased, both verified bit-exact first.

Run serially on the real chip: python benchmarks/probe_chain.py
Results land in benchmarks/probe_chain.json.
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
PASSES = 8
REPS = 4
NAMES = ("gaussian3", "sharpen", "edge")


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
    want = hwc_to_planar(
        oracle.sobel_edge_oracle(
            oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(img))
        )[None]
    )

    # ---- VPU lane-shift variant of the sharpen/edge stages ----

    def _shift_lanes_clamp(t, d):
        """out[..., i] = t[..., clamp(i - d)] along the lane (W) axis."""
        if d == 0:
            return t
        k, hh, ww = t.shape
        rolled = pltpu.roll(t, d % ww, 2)
        col = lax.broadcasted_iota(jnp.int32, t.shape, 2)
        if d > 0:
            edge = jnp.broadcast_to(t[:, :, :1], t.shape)
            return jnp.where(col < d, edge, rolled)
        edge = jnp.broadcast_to(t[:, :, -1:], t.shape)
        return jnp.where(col >= ww + d, edge, rolled)

    def _wpass(t, taps):
        r = (len(taps) - 1) // 2
        acc = None
        for j, tap in enumerate(taps):
            if tap == 0:
                continue
            term = _shift_lanes_clamp(t, r - j)
            if tap != 1:
                term = term * int(tap)
            acc = term if acc is None else acc + term
        return acc

    def _stage_vpu(name, x_i32, bands):
        if name.startswith("gaussian"):
            return pb._mxu_stage(name, x_i32, bands)  # blur keeps the MXU
        if name == "sharpen":
            lr = _wpass(x_i32, (1, 0, 1))
            ud = pb._hpass_rolls(x_i32, (1, 0, 1))
            return jnp.clip(5 * x_i32 - lr - ud, 0, 255)
        if name == "edge":
            sm = _wpass(x_i32, (1, 2, 1))
            df = _wpass(x_i32, (-1, 0, 1))
            gx = pb._hpass_rolls(df, (1, 2, 1))
            gy = pb._hpass_rolls(sm, (-1, 0, 1))
            return jnp.minimum(jnp.abs(gx) + jnp.abs(gy), 255)
        raise KeyError(name)

    def _chain_vpu_kernel(x_ref, *refs, band_keys):
        o_ref = refs[-1]
        bands = {key: refs[i][:] for i, key in enumerate(band_keys)}
        x = x_ref[:].astype(jnp.int32)
        for name in NAMES:
            x = _stage_vpu(name, x, bands)
        o_ref[:] = x.astype(jnp.uint8)

    def make_vpu_variant(k, vmem_mb=None):
        keys, mats = pb._chain_band_specs(("gaussian3",), w, 1)
        band_args = [jnp.asarray(m, jnp.bfloat16) for m in mats]
        call = pl.pallas_call(
            functools.partial(_chain_vpu_kernel, band_keys=tuple(keys)),
            grid=(n // k,),
            in_specs=[
                pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ] + [
                pl.BlockSpec((w, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in band_args
            ],
            out_specs=pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            input_output_aliases={0: 0},
            **pb._compiler_params(vmem_mb),
        )
        return lambda x: call(x, *band_args)

    def make_current(k, vmem_mb=None):
        return lambda x: pb.filter_chain_planar_pallas(
            x, NAMES, alias=True, block_planes=k, vmem_limit_mb=vmem_mb
        )

    # The VPU-W variant's int32 roll temporaries overflow VMEM above
    # k~20 (k=24 crashes the compile); sweep the feasible range, with a
    # raised-cap attempt on top.
    variants = {
        "mxu4_k24": make_current(24),
        "vpu_w_k8": make_vpu_variant(8),
        "vpu_w_k12": make_vpu_variant(12),
        "vpu_w_k15": make_vpu_variant(15),
        "vpu_w_k20": make_vpu_variant(20),
        "vpu_w_k40_vmem64M": make_vpu_variant(40, 64),
    }
    results = {}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_chain.json")
    for name, fn in variants.items():
        try:
            @functools.partial(jax.jit, static_argnames="r")
            def chained(s, r, fn=fn):
                out = lax.fori_loop(0, r, lambda i, x: fn(x), s)
                return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

            got = np.asarray(jax.jit(lambda s, fn=fn: fn(s)[:c])(stream))
            err = int(np.max(np.abs(got.astype(int) - want.astype(int))))
            assert err == 0, (name, err)

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
            results[name] = {
                "per_pass_ms": round(best * 1e3, 3),
                "img_per_s": round(NUM_IMAGES / best),
            }
            log(f"{name:20s} {best * 1e3:7.2f} ms "
                f"{NUM_IMAGES / best:12,.0f} img/s")
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{name:20s} FAILED: {type(e).__name__}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
