"""Fused Pallas DCT kernels for the device JPEG codec.

The XLA formulation of the islow IDCT/fDCT (ops/jpeg_decode.py,
ops/jpeg_encode.py) is an unrolled elementwise graph over 64 block-
position planes. Each output plane of a 1-D pass reads 8 input planes and
each input feeds 8 outputs, so XLA cannot fuse across a pass without 8x
recompute — it materializes the 64-plane intermediate sets in HBM
(~6 int32 round trips of the full sample volume per component). These
kernels run both passes (plus dequantize / quantize) inside one
`pallas_call` with every intermediate resident in VMEM: HBM traffic drops
to one int16 read + one narrow write of the block grid.

Layout: (B, 64, n) — block-position index in the sublane axis (64 = 4x16
int16 tiles / 2x32 uint8 tiles), the flattened block grid in the lane
axis (n = Hb*Wb, padded to a multiple of 128 by the wrappers). This is
the same "planes" layout the XLA decoder uses, so the kernels are drop-in
replacements for the dequant+IDCT / fDCT+quantize segments; the arithmetic
is literally the same functions (`_idct_planes_core`, `_fdct_1d`) traced
into the kernel, so bit-exactness follows from the XLA path's proofs.

Numerics note (quantizer): Mosaic lowers `lax.div` on int32, but the
encoder's round-half-away division is implemented as float32 divide +
floor + exact one-step correction — int32 `//` by a constant is not
guaranteed a fast lowering, while the correction trick is three cheap
vector ops and provably exact for |t| + qd/2 < 2^24 (the fDCT range).

Reference behavior: `/root/reference/` has no device codec at all (CImg
decodes on host, `heterogeneous_blur.c:106-137`); this is the TPU-native
extension of that data path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params(vmem_limit_mb: int | None):
    if not vmem_limit_mb:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 2**20
        )
    }


def _pad_lanes(x: jnp.ndarray, n: int) -> tuple[jnp.ndarray, int]:
    """Pad the trailing (lane) dim up to a multiple of 128."""
    n_pad = -(-n // 128) * 128
    if n_pad != n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)])
    return x, n_pad


def _pad_batch(x: jnp.ndarray, b: int, block_b: int) -> jnp.ndarray:
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        x = jnp.pad(x, [(0, b_pad - b)] + [(0, 0)] * (x.ndim - 1))
    return x


# ---- decode: dequantize + 2-pass islow IDCT + range limit ----


def _idct_kernel(in_ref, out_ref, *, q: tuple):
    from hipe_tpu.ops.jpeg_decode import _idct_planes_core

    planes = [
        in_ref[:, p, :].astype(jnp.int32) * q[p] for p in range(64)
    ]
    out = _idct_planes_core(planes)
    for p in range(64):
        out_ref[:, p, :] = out[p]


@functools.partial(
    jax.jit, static_argnames=("qkey", "block_b", "interpret", "vmem_limit_mb")
)
def _dequant_idct_call(
    coefs_t: jnp.ndarray,
    qkey: tuple,
    block_b: int,
    interpret: bool,
    vmem_limit_mb: int | None,
) -> jnp.ndarray:
    b, _, n = coefs_t.shape
    x = _pad_batch(coefs_t, b, block_b)
    bp = x.shape[0]
    kernel = functools.partial(_idct_kernel, q=qkey)
    out = pl.pallas_call(
        kernel,
        grid=(bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, 64, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, 64, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, 64, n), jnp.uint8),
        interpret=interpret,
        **_compiler_params(None if interpret else vmem_limit_mb),
    )(x)
    return out[:b]


def dequant_idct_planes_pallas(
    coefs: jnp.ndarray,
    qtable: np.ndarray,
    *,
    block_b: int = 8,
    interpret: bool = False,
    vmem_limit_mb: int | None = 100,
) -> list:
    """(..., Hb, Wb, 64) quantized coefficients -> 64 uint8 sample planes.

    Drop-in for the XLA `_dequant_planes` + `_idct_planes_core` pair:
    returns the same 64 (..., Hb*Wb) uint8 block-position planes, bit-exact
    (same traced arithmetic), with all pass intermediates VMEM-resident.
    """
    bshape = coefs.shape[:-3]
    hb, wb = coefs.shape[-3], coefs.shape[-2]
    n = hb * wb
    flat_b = int(np.prod(bshape)) if bshape else 1
    t = jnp.swapaxes(
        coefs.reshape(flat_b, n, 64), -1, -2
    )  # (B, 64, n) int16
    t, n_pad = _pad_lanes(t, n)
    qkey = tuple(int(v) for v in np.asarray(qtable, dtype=np.int64).reshape(64))
    out = _dequant_idct_call(t, qkey, min(block_b, max(flat_b, 1)),
                             interpret, vmem_limit_mb)
    return [out[:, p, :n].reshape(*bshape, n) for p in range(64)]


# ---- encode: 2-pass islow fDCT + sign-aware rounding quantizer ----


def _quantize_exact(t: jnp.ndarray, qd: int) -> jnp.ndarray:
    """round-half-away |t|-division, exact without integer div.

    v = (|t| + qd//2) // qd via float32 divide + floor + one correction
    step. Exact while |t| + qd//2 < 2^24 (float32-exact integers); the
    fDCT output is bounded well inside that for 8-bit samples.
    """
    a = jnp.abs(t) + (qd >> 1)
    v = (a.astype(jnp.float32) * np.float32(1.0 / qd)).astype(jnp.int32)
    # reciprocal-multiply can be off by one either way at exact multiples
    v = v - (v * qd > a).astype(jnp.int32)
    v = v + ((v + 1) * qd <= a).astype(jnp.int32)
    return jnp.where(t < 0, -v, v).astype(jnp.int16)


def _fdct_kernel(in_ref, out_ref, *, q: tuple):
    from hipe_tpu.ops.jpeg_encode import _fdct_planes_core

    planes = [
        in_ref[:, p, :].astype(jnp.int32) - 128 for p in range(64)
    ]
    out = _fdct_planes_core(planes)
    for p in range(64):
        out_ref[:, p, :] = _quantize_exact(out[p], int(q[p]) << 3)


@functools.partial(
    jax.jit, static_argnames=("qkey", "block_b", "interpret", "vmem_limit_mb")
)
def _fdct_quant_call(
    samples_t: jnp.ndarray,
    qkey: tuple,
    block_b: int,
    interpret: bool,
    vmem_limit_mb: int | None,
) -> jnp.ndarray:
    b, _, n = samples_t.shape
    x = _pad_batch(samples_t, b, block_b)
    bp = x.shape[0]
    kernel = functools.partial(_fdct_kernel, q=qkey)
    out = pl.pallas_call(
        kernel,
        grid=(bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, 64, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, 64, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, 64, n), jnp.int16),
        interpret=interpret,
        **_compiler_params(None if interpret else vmem_limit_mb),
    )(x)
    return out[:b]


def fdct_quantize_planes_pallas(
    sample_planes: list,
    hb: int,
    wb: int,
    qtable: np.ndarray,
    *,
    block_b: int = 8,
    interpret: bool = False,
    vmem_limit_mb: int | None = 100,
) -> jnp.ndarray:
    """64 uint8 sample-position planes -> (..., hb, wb, 64) int16 coefs.

    Drop-in for the XLA `fdct_quantize` body after plane extraction:
    same natural-order quantized coefficients, bit-exact.
    """
    bshape = sample_planes[0].shape[:-1]
    n = hb * wb
    flat_b = int(np.prod(bshape)) if bshape else 1
    t = jnp.stack(
        [p.reshape(flat_b, n) for p in sample_planes], axis=1
    ).astype(jnp.uint8)  # (B, 64, n)
    t, n_pad = _pad_lanes(t, n)
    qkey = tuple(int(v) for v in np.asarray(qtable, dtype=np.int64).reshape(64))
    out = _fdct_quant_call(t, qkey, min(block_b, max(flat_b, 1)),
                           interpret, vmem_limit_mb)
    stacked = jnp.moveaxis(out[:, :, :n], 1, -1)  # (B, n, 64)
    return stacked.reshape(*bshape, hb, wb, 64)
