"""Device-side JPEG decode: dequantize + IDCT + upsample + color convert.

The TPU-native decode split. JPEG decoding is two very different halves:

- **Entropy decode** (Huffman/arithmetic) is serial and branchy — it stays on
  the host (`io_/jpeg.py:read_coefficients`, backed by libjpeg's
  ``jpeg_read_coefficients``), exactly as the reference keeps its decode on
  the host CPU (CImg ``load_jpeg``, `/root/reference/CImg/CImg.h:51770`,
  used by `heterogeneous_blur.c:106-137`).
- **Dequantize + IDCT + chroma upsample + YCbCr->RGB** is dense, regular
  vector math — this module runs it on the TPU, batched over images.

Everything here is **bit-exact against libjpeg(-turbo)'s default integer
pipeline**: ``jpeg_idct_islow`` (jidctint.c — 13-bit fixed-point Loeffler
IDCT with PASS1_BITS=2 and the wrap-around range-limit table),
``h2v2_fancy_upsample`` / ``h2v1_fancy_upsample`` (jdsample.c triangular
filters), and ``ycc_rgb_convert`` (jdcolor.c 16-bit fixed-point tables).
All arithmetic is int32 with the same rounding/shift semantics, so the
decoded pixels equal the host codec's byte-for-byte (asserted by
tests/test_jpeg_device.py on real encodes, including progressive).

Layout is TPU-first: the 64 DCT coefficient positions become 64 separate
``(B, Hb, Wb)`` planes (block-grid coords in the minor dims -> lanes), the
two IDCT passes are Python-unrolled elementwise graphs over those planes
(XLA fuses them into a handful of VPU kernels), and plane assembly is one
relayout. No gathers, no dynamic shapes, no per-block loops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# jidctint.c fixed-point constants (CONST_BITS = 13).
CONST_BITS = 13
PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172

# jdcolor.c constants (SCALEBITS = 16).
_SCALEBITS = 16
_ONE_HALF = 1 << (_SCALEBITS - 1)


def _fix(x: float) -> int:
    return int(x * (1 << _SCALEBITS) + 0.5)


_FIX_1_40200 = _fix(1.40200)
_FIX_1_77200 = _fix(1.77200)
_FIX_0_71414 = _fix(0.71414)
_FIX_0_34414 = _fix(0.34414)


def _descale(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """DESCALE(x, n) = arithmetic shift with round-half-up (jpegint.h)."""
    return (x + (1 << (n - 1))) >> n


def _range_limit(val: jnp.ndarray) -> jnp.ndarray:
    """Exact emulation of libjpeg's post-IDCT range-limit table.

    jdmaster.c prepare_range_limit_table builds a 1024-entry wrap-around
    table indexed by ``val & RANGE_MASK``; for in-range values it is
    clamp(val + 128, 0, 255), and far-out-of-range (corrupt-stream) values
    wrap exactly as the table does. Reproduced arithmetically so no gather
    is needed.
    """
    m = val & 1023
    return jnp.where(
        m < 128, m + 128,
        jnp.where(m < 512, 255, jnp.where(m < 896, 0, m - 896)),
    )


def _idct_1d(d: list[jnp.ndarray], final: bool) -> list[jnp.ndarray]:
    """One 8-point islow IDCT pass over 8 coefficient planes.

    ``final=False``: column pass — output descaled by CONST_BITS-PASS1_BITS.
    ``final=True``: row pass — output descaled by CONST_BITS+PASS1_BITS+3
    (sample-domain; caller applies the range limit). Bit-exact port of the
    jidctint.c arithmetic (int32, same rounding).
    """
    shift = (CONST_BITS - PASS1_BITS) if not final else (
        CONST_BITS + PASS1_BITS + 3
    )
    # Even part: rotator c(-6).
    z2, z3 = d[2], d[6]
    z1 = (z2 + z3) * _F_0_541196100
    t2 = z1 - z3 * _F_1_847759065
    t3 = z1 + z2 * _F_0_765366865
    z2, z3 = d[0], d[4]
    t0 = (z2 + z3) << CONST_BITS
    t1 = (z2 - z3) << CONST_BITS
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    # Odd part.
    o0, o1, o2, o3 = d[7], d[5], d[3], d[1]
    z1 = o0 + o3
    z2 = o1 + o2
    z3 = o0 + o2
    z4 = o1 + o3
    z5 = (z3 + z4) * _F_1_175875602
    o0 = o0 * _F_0_298631336
    o1 = o1 * _F_2_053119869
    o2 = o2 * _F_3_072711026
    o3 = o3 * _F_1_501321110
    z1 = z1 * -_F_0_899976223
    z2 = z2 * -_F_2_562915447
    z3 = z3 * -_F_1_961570560 + z5
    z4 = z4 * -_F_0_390180644 + z5
    o0 = o0 + z1 + z3
    o1 = o1 + z2 + z4
    o2 = o2 + z2 + z3
    o3 = o3 + z1 + z4
    return [
        _descale(t10 + o3, shift),
        _descale(t11 + o2, shift),
        _descale(t12 + o1, shift),
        _descale(t13 + o0, shift),
        _descale(t13 - o0, shift),
        _descale(t12 - o1, shift),
        _descale(t11 - o2, shift),
        _descale(t10 - o3, shift),
    ]


def idct8x8_islow(coefs: jnp.ndarray, qtable: np.ndarray) -> jnp.ndarray:
    """Dequantize + 2-D islow IDCT of a block grid, bit-exact vs jidctint.c.

    coefs: (..., Hb, Wb, 64) int16/int32 quantized coefficients in natural
    order (as the entropy decoder stores them, jdhuff.c). qtable: (64,)
    host-side quant table. Returns (..., Hb*8, Wb*8) uint8 sample planes.
    """
    q = np.asarray(qtable, dtype=np.int32)
    x = coefs.astype(jnp.int32)
    # 64 planes, dequantized: plane k multiplies by the scalar q[k].
    planes = [x[..., k] * int(q[k]) for k in range(64)]
    # Column pass: fixed column c walks rows r (index r*8+c).
    ws: list = [None] * 64
    for c in range(8):
        col = _idct_1d([planes[r * 8 + c] for r in range(8)], final=False)
        for r in range(8):
            ws[r * 8 + c] = col[r]
    # Row pass: fixed row r walks columns c.
    out: list = [None] * 64
    for r in range(8):
        row = _idct_1d([ws[r * 8 + c] for c in range(8)], final=True)
        for c in range(8):
            out[r * 8 + c] = _range_limit(row[c])
    # Assemble: samples[..., 8*i+r, 8*j+c] = out[r*8+c][..., i, j].
    grid = jnp.stack(
        [jnp.stack(out[r * 8 : r * 8 + 8], axis=-1) for r in range(8)],
        axis=-2,
    )  # (..., Hb, Wb, 8r, 8c)
    grid = jnp.moveaxis(grid, -2, -3)  # (..., Hb, 8r, Wb, 8c)
    bshape = grid.shape[:-4]
    hb, wb = grid.shape[-4], grid.shape[-2]
    return grid.reshape(*bshape, hb * 8, wb * 8).astype(jnp.uint8)


def _clamp_rows(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Row-shifted copy with edge replication (static slicing, no gather)."""
    if offset == -1:
        return jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    if offset == 1:
        return jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    raise ValueError(offset)


def _clamp_cols(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    if offset == -1:
        return jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    if offset == 1:
        return jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)
    raise ValueError(offset)


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Elementwise interleave of two same-shape arrays along `axis`."""
    stacked = jnp.stack([a, b], axis=axis + 1 if axis >= 0 else axis)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def fancy_upsample_h2v2(plane: jnp.ndarray) -> jnp.ndarray:
    """2x2 triangular chroma upsample, bit-exact vs jdsample.c h2v2_fancy.

    plane: (..., h, w) uint8/int32. Returns (..., 2h, 2w) int32 samples.
    Per output pixel: (9*nearest + 3*next-h + 3*next-v + 1*diagonal) with
    the reference's exact rounding (+8 for even columns, +7 for odd) and
    edge replication at all four borders.
    """
    x = plane.astype(jnp.int32)
    up = _clamp_rows(x, -1)
    down = _clamp_rows(x, 1)
    cs_even = 3 * x + up      # vertical pair sums for output rows 2i
    cs_odd = 3 * x + down     # and 2i+1
    cs = _interleave(cs_even, cs_odd, axis=-2)  # (..., 2h, w)
    left = _clamp_cols(cs, -1)
    right = _clamp_cols(cs, 1)
    out_even = (3 * cs + left + 8) >> 4
    out_odd = (3 * cs + right + 7) >> 4
    return _interleave(out_even, out_odd, axis=-1)  # (..., 2h, 2w)


def fancy_upsample_h2v1(plane: jnp.ndarray) -> jnp.ndarray:
    """2x1 triangular chroma upsample, bit-exact vs jdsample.c h2v1_fancy."""
    x = plane.astype(jnp.int32)
    left = _clamp_cols(x, -1)
    right = _clamp_cols(x, 1)
    out_even = (3 * x + left + 1) >> 2
    out_odd = (3 * x + right + 2) >> 2
    return _interleave(out_even, out_odd, axis=-1)


def ycc_to_rgb(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Fixed-point YCbCr->RGB, bit-exact vs jdcolor.c build_ycc_rgb_table.

    y, cb, cr: (..., H, W) int32 samples in [0, 255]. Returns
    (..., H, W, 3) uint8 interleaved RGB. The table lookups are reproduced
    arithmetically; the sample range limit reduces to a plain clamp because
    y + tab always lands in the simple-table segment [-256, 511].
    """
    cbc = cb - 128
    crc = cr - 128
    r = y + ((_FIX_1_40200 * crc + _ONE_HALF) >> _SCALEBITS)
    b = y + ((_FIX_1_77200 * cbc + _ONE_HALF) >> _SCALEBITS)
    g = y + ((-_FIX_0_34414 * cbc + _ONE_HALF + -_FIX_0_71414 * crc)
             >> _SCALEBITS)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


class DecodeGeometry(NamedTuple):
    """Static shape/subsampling info for one jit specialization."""

    width: int
    height: int
    ncomps: int
    # Per component: (h_samp, v_samp, width_in_blocks, height_in_blocks).
    comps: tuple[tuple[int, int, int, int], ...]
    max_h: int
    max_v: int


def geometry_of(co) -> DecodeGeometry:
    """DecodeGeometry from an io_.jpeg.JpegCoefficients."""
    return DecodeGeometry(
        width=co.width,
        height=co.height,
        ncomps=co.num_components,
        comps=tuple(
            (c.h_samp, c.v_samp, c.coefs.shape[1], c.coefs.shape[0])
            for c in co.components
        ),
        max_h=co.max_h,
        max_v=co.max_v,
    )


def _downsampled_dims(geo: DecodeGeometry, ci: int) -> tuple[int, int]:
    """Component's real sample dims (jdmaster.c downsampled_width/height)."""
    h_samp, v_samp, _, _ = geo.comps[ci]
    dw = -(-geo.width * h_samp // geo.max_h)
    dh = -(-geo.height * v_samp // geo.max_v)
    return dh, dw


def supported(geo: DecodeGeometry) -> bool:
    """True if this geometry decodes on device (else fall back to host).

    Covers the sampling layouts libjpeg encoders emit: grayscale, 4:4:4,
    4:2:2 and 4:2:0 YCbCr. Exotic factors (4:1:1, h1v2) take the host path.
    """
    if geo.ncomps == 1:
        return True
    if geo.ncomps != 3:
        return False
    y_h, y_v, _, _ = geo.comps[0]
    if (y_h, y_v) != (geo.max_h, geo.max_v):
        return False
    for ci in (1, 2):
        h_samp, v_samp, _, _ = geo.comps[ci]
        hr = geo.max_h // h_samp
        vr = geo.max_v // v_samp
        if geo.max_h % h_samp or geo.max_v % v_samp:
            return False
        if (hr, vr) not in ((1, 1), (2, 1), (2, 2)):
            return False
    return True


def decode_planes(
    geo: DecodeGeometry,
    comp_coefs: list[jnp.ndarray],
    qtables: list[np.ndarray],
) -> jnp.ndarray:
    """Finish decoding on device: coefficients -> (..., H, W, C) uint8.

    comp_coefs[i]: (..., Hb_i, Wb_i, 64) int16 quantized coefficients.
    qtables[i]: (64,) uint16 host-side quant table for component i.
    Leading batch dims broadcast through every stage.
    """
    if not supported(geo):
        raise ValueError(f"unsupported sampling geometry: {geo.comps}")
    samples = [
        idct8x8_islow(comp_coefs[ci], qtables[ci])
        for ci in range(geo.ncomps)
    ]
    if geo.ncomps == 1:
        y = samples[0][..., : geo.height, : geo.width]
        return y[..., None]
    planes = []
    for ci in range(geo.ncomps):
        dh, dw = _downsampled_dims(geo, ci)
        plane = samples[ci][..., :dh, :dw].astype(jnp.int32)
        h_samp, v_samp, _, _ = geo.comps[ci]
        hr = geo.max_h // h_samp
        vr = geo.max_v // v_samp
        if (hr, vr) == (2, 2):
            plane = fancy_upsample_h2v2(plane)
        elif (hr, vr) == (2, 1):
            plane = fancy_upsample_h2v1(plane)
        planes.append(plane[..., : geo.height, : geo.width])
    return ycc_to_rgb(planes[0], planes[1], planes[2])


@functools.lru_cache(maxsize=64)
def _jitted_decoder(geo: DecodeGeometry, qkey: tuple):
    """Per-(geometry, quant tables) jitted device decoder."""
    qtables = [np.array(q, dtype=np.uint16) for q in qkey]

    @jax.jit
    def run(*comp_coefs):
        return decode_planes(geo, list(comp_coefs), qtables)

    return run


def decode_coefficients(co, device=None) -> jax.Array:
    """Decode an io_.jpeg.JpegCoefficients on device -> (H, W, C) uint8.

    The quant tables are folded into the compiled program as constants
    (they are per-encoder, shared across a stream); coefficient planes are
    the only host->device traffic.
    """
    geo = geometry_of(co)
    qkey = tuple(tuple(int(v) for v in c.qtable) for c in co.components)
    fn = _jitted_decoder(geo, qkey)
    coefs = [c.coefs for c in co.components]
    if device is not None:
        coefs = [jax.device_put(a, device) for a in coefs]
    return fn(*coefs)


def make_batch_decoder(geo: DecodeGeometry, qtables: list[np.ndarray]):
    """Jitted (B,...) batch decoder for a fixed geometry + quant tables.

    Returns fn(*comp_coefs) -> (B, H, W, C) uint8; use for device-resident
    coefficient streams (the decode analog of runtime/device_stream.py).
    """
    qkey = tuple(tuple(int(v) for v in np.asarray(q)) for q in qtables)
    return _jitted_decoder(geo, qkey)
