"""Lossless DCT-domain transforms: exactness at the right level.

No jpegtran binary exists here to diff against, so verification is by
the transform's defining properties:

- COEFFICIENT-exact (the lossless guarantee, the same one jpegtran
  makes): the transformed stream's dequantized coefficients are exactly
  the DCT-symmetry images of the originals. Checked against an
  independent straight-loop numpy oracle, through a full file round
  trip.
- FLOAT-IDCT semantic: a float64 reference IDCT (no rounding) of the
  transformed stream equals the spatial transform of the original's to
  fp tolerance — independent physics-level confirmation the symmetry
  math is right.
- INTEGER decode bound: jpeg_idct_islow's floor-shift descales are not
  odd-symmetric (DESCALE(-x) != -DESCALE(x)) and its pass order is
  fixed, so the integer decode of a transformed stream can differ from
  the spatial transform of the original decode by +-1 per sample —
  exactly as with jpegtran. Asserted as a hard bound.
- INVOLUTION byte-identity: op + inverse reproduces the canonical file
  byte-for-byte through the deterministic coefficient writer — the
  coefficients and quant tables round-trip exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.io_ import jpeg
from hipe_tpu.ops import jpeg_decode as jd
from hipe_tpu.ops import jpeg_transform as jt

if not jpeg.native_available():  # pragma: no cover
    pytest.skip("native libjpeg codec unavailable", allow_module_level=True)

def _spatial(op, img):
    if op == "flip_h":
        return img[:, ::-1]
    if op == "flip_v":
        return img[::-1]
    if op == "rot90":       # clockwise
        return np.rot90(img, k=-1)
    if op == "rot180":
        return np.rot90(img, k=2)
    if op == "rot270":
        return np.rot90(img, k=1)
    if op == "transpose":
        return np.swapaxes(img, 0, 1)
    if op == "transverse":
        return np.swapaxes(np.rot90(img, 2), 0, 1)
    raise AssertionError(op)


def _stream(h, w, sub="420", quality=85, seed=0, c=3, **opts):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if c == 1:
        return jpeg.encode_bytes_opts(img, quality=quality, **opts)
    return jpeg.encode_bytes_opts(img, quality=quality, subsampling=sub,
                                  **opts)


def _dims(co, comp):
    dh = -(-co.height * comp.v_samp // co.max_v)
    dw = -(-co.width * comp.h_samp // co.max_h)
    return dh, dw


def _component_samples(data):
    """Per-component integer IDCT sample planes (no upsampling)."""
    co = jpeg.read_coefficients(data)
    return [
        np.asarray(jd.idct8x8_islow(jnp.asarray(c.coefs), c.qtable))
        [: _dims(co, c)[0], : _dims(co, c)[1]]
        for c in co.components
    ]


_BASIS = np.array([
    [0.5 * (np.sqrt(0.5) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)]
    for x in range(8)
])  # samples[x] = sum_u BASIS[x, u] * F[u]


def _component_samples_float(data):
    """Per-component FLOAT reference IDCT (symmetric, no rounding)."""
    co = jpeg.read_coefficients(data)
    out = []
    for c in co.components:
        hb, wb, _ = c.coefs.shape
        dq = (c.coefs.reshape(hb, wb, 8, 8).astype(np.float64)
              * np.asarray(c.qtable, np.float64).reshape(8, 8))
        s = np.einsum("yu,hwuv,xv->hywx", _BASIS, dq, _BASIS)
        s = s.reshape(hb * 8, wb * 8)
        dh, dw = _dims(co, c)
        out.append(s[:dh, :dw])
    return out


def _coef_oracle(op, blocks):
    """Straight-loop numpy DCT-symmetry oracle on (Hb, Wb, 8, 8)."""
    hb, wb = blocks.shape[:2]
    if op == "flip_h":
        out = np.empty_like(blocks)
        for by in range(hb):
            for bx in range(wb):
                for u in range(8):
                    for v in range(8):
                        out[by, wb - 1 - bx, u, v] = (
                            blocks[by, bx, u, v] * (1 if v % 2 == 0 else -1))
        return out
    if op == "flip_v":
        out = np.empty_like(blocks)
        for by in range(hb):
            for bx in range(wb):
                for u in range(8):
                    for v in range(8):
                        out[hb - 1 - by, bx, u, v] = (
                            blocks[by, bx, u, v] * (1 if u % 2 == 0 else -1))
        return out
    if op == "transpose":
        out = np.empty((wb, hb, 8, 8), dtype=blocks.dtype)
        for by in range(hb):
            for bx in range(wb):
                out[bx, by] = blocks[by, bx].T
        return out
    if op == "rot90":
        return _coef_oracle("flip_h", _coef_oracle("transpose", blocks))
    if op == "rot270":
        return _coef_oracle("flip_v", _coef_oracle("transpose", blocks))
    if op == "rot180":
        return _coef_oracle("flip_v", _coef_oracle("flip_h", blocks))
    if op == "transverse":
        return _coef_oracle(
            "flip_v", _coef_oracle("flip_h", _coef_oracle("transpose",
                                                          blocks)))
    raise AssertionError(op)


@pytest.mark.parametrize("op", jt.OPS)
@pytest.mark.parametrize("sub,dims", [("420", (32, 48)), ("422", (24, 32)),
                                      ("444", (16, 24)), ("440", (32, 16))])
def test_coefficient_exact_vs_loop_oracle(op, sub, dims):
    # The transformed FILE's coefficients equal the independent oracle's
    # expectation — through entropy encode + decode, so writer/reader
    # geometry (sampling swaps included) is validated too.
    data = _stream(*dims, sub=sub, seed=3)
    out = jt.transform_bytes(data, op)
    ci = jpeg.read_coefficients(data)
    co = jpeg.read_coefficients(out)
    for a, b in zip(ci.components, co.components):
        hb, wb, _ = a.coefs.shape
        want = _coef_oracle(op, a.coefs.reshape(hb, wb, 8, 8))
        got = b.coefs.reshape(*b.coefs.shape[:2], 8, 8)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("op", jt.OPS)
@pytest.mark.parametrize("sub,dims", [("420", (32, 48)), ("444", (16, 24)),
                                      ("440", (32, 16))])
def test_float_exact_and_integer_bound(op, sub, dims):
    data = _stream(*dims, sub=sub, seed=6)
    out = jt.transform_bytes(data, op)
    # Float reference IDCT: the dequantized transform is exact.
    for b, a in zip(_component_samples_float(data),
                    _component_samples_float(out)):
        np.testing.assert_allclose(
            a, _spatial(op, b[..., None])[..., 0], atol=1e-8)
    # Integer IDCT: descale floor-shifts are not odd-symmetric, so the
    # integer decode is within +-1 of the spatial transform (the
    # jpegtran property), never more.
    for b, a in zip(_component_samples(data), _component_samples(out)):
        diff = np.abs(a.astype(int)
                      - _spatial(op, b[..., None])[..., 0].astype(int))
        assert diff.max() <= 1, diff.max()


def test_progressive_stream_and_writer_options():
    datap = _stream(32, 48, seed=6, progressive=True)
    outp = jt.transform_bytes(datap, "flip_h", progressive=True)
    for x, y in zip(_component_samples_float(datap),
                    _component_samples_float(outp)):
        np.testing.assert_allclose(y, x[:, ::-1], atol=1e-8)
    ar = jt.transform_bytes(datap, "rot90", arithmetic=True)
    op = jt.transform_bytes(datap, "rot90", optimize=True)
    hu = jt.transform_bytes(datap, "rot90")
    assert b"\xff\xc9" in ar and len(op) < len(hu)
    np.testing.assert_array_equal(jpeg.decode_bytes(ar),
                                  jpeg.decode_bytes(hu))
    np.testing.assert_array_equal(jpeg.decode_bytes(op),
                                  jpeg.decode_bytes(hu))


def test_involutions_byte_identical():
    data = _stream(32, 48, seed=7)
    co = jpeg.read_coefficients(data)
    canon = jpeg.write_coefficients(
        [c.coefs for c in co.components], 48, 32, subsampling="420",
        qtables=[c.qtable for c in co.components])
    assert jt.transform_bytes(
        jt.transform_bytes(data, "transpose"), "transpose") == canon
    assert jt.transform_bytes(
        jt.transform_bytes(data, "flip_h"), "flip_h") == canon
    r = data
    for _ in range(4):
        r = jt.transform_bytes(r, "rot90")
    assert r == canon


def test_perfect_rule_enforced():
    # 33 wide at 4:2:0: width not an iMCU multiple -> flip_h refused;
    # transpose still works (always perfect), rot90 works (height 32
    # is an iMCU multiple).
    data = _stream(32, 33, seed=9)
    with pytest.raises(ValueError, match="not lossless"):
        jt.transform_bytes(data, "flip_h")
    for op in ("transpose", "rot90"):
        out = jt.transform_bytes(data, op)
        for b, a in zip(_component_samples_float(data),
                        _component_samples_float(out)):
            np.testing.assert_allclose(
                a, _spatial(op, b[..., None])[..., 0], atol=1e-8)


def test_any_quality_tables_pass_through():
    # The writer installs the stream's OWN tables (transposed for the
    # swap ops), so any quality works, and the output stream's tables
    # are the transposed input tables.
    data = _stream(16, 16, quality=73, seed=11)
    a = _component_samples(data)
    out = jt.transform_bytes(data, "rot180")
    for x, y in zip(a, _component_samples(out)):
        np.testing.assert_array_equal(y, x[::-1, ::-1])
    co_in = jpeg.read_coefficients(data)
    co_out = jpeg.read_coefficients(jt.transform_bytes(data, "transpose"))
    for ci, co in zip(co_in.components, co_out.components):
        np.testing.assert_array_equal(
            np.asarray(co.qtable).reshape(8, 8),
            np.asarray(ci.qtable).reshape(8, 8).T)


def test_grayscale_stream():
    data = _stream(24, 40, c=1, seed=13)
    out = jt.transform_bytes(data, "flip_v")
    a = jpeg.decode_bytes(data)[::-1].astype(int)
    b = jpeg.decode_bytes(out).astype(int)
    assert np.abs(b - a).max() <= 1
    ci = jpeg.read_coefficients(data)
    co = jpeg.read_coefficients(out)
    hb, wb, _ = ci.components[0].coefs.shape
    np.testing.assert_array_equal(
        co.components[0].coefs.reshape(hb, wb, 8, 8),
        _coef_oracle("flip_v", ci.components[0].coefs.reshape(hb, wb, 8, 8)))


def test_transform_batch_matches_singles_and_groups():
    # Mixed geometries/qualities in one call group correctly; each file
    # byte-equals the single-image path (which uses the single writer);
    # the batch path goes through the pthread batch writer with the
    # qtable override.
    rng = np.random.default_rng(17)
    ps = [jpeg.encode_bytes_opts(
        rng.integers(0, 256, (32, 48, 3), np.uint8), quality=85)
        for _ in range(3)]
    ps += [jpeg.encode_bytes_opts(
        rng.integers(0, 256, (16, 24, 3), np.uint8), quality=70,
        subsampling="444")]
    ps += [jpeg.encode_bytes_opts(
        rng.integers(0, 256, (16, 24, 1), np.uint8), quality=60)]
    for op in ("rot90", "flip_h"):
        got = jt.transform_batch(ps, op)
        want = [jt.transform_bytes(p, op) for p in ps]
        assert got == want, op
    got = jt.transform_batch(ps, "transpose", optimize=True)
    want = [jt.transform_bytes(p, "transpose", optimize=True) for p in ps]
    assert got == want


def test_transform_batch_rejects_imperfect_group():
    rng = np.random.default_rng(19)
    ps = [jpeg.encode_bytes_opts(
        rng.integers(0, 256, (32, 33, 3), np.uint8), quality=85)]
    with pytest.raises(ValueError, match="not lossless"):
        jt.transform_batch(ps, "flip_h")


def test_markers_copied_through_transforms():
    # jpegtran -copy behavior: Exif/ICC/COM markers survive transforms
    # verbatim; copy_markers=False drops them; batch matches singles.
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    co = jpeg.read_coefficients(jpeg.encode_bytes_opts(img, quality=85))
    mks = [(0xE1, b"Exif\x00\x00PAYLOAD"), (0xFE, b"hello"),
           (0xE2, b"ICC_PROFILE\x00" + bytes(32))]
    src = jpeg.write_coefficients([c.coefs for c in co.components], 16, 16,
                                  quality=85, markers=mks)
    assert jpeg.read_markers(src) == mks
    out = jt.transform_bytes(src, "rot90")
    assert jpeg.read_markers(out) == mks
    out2 = jt.transform_bytes(src, "rot90", copy_markers=False)
    assert jpeg.read_markers(out2) == []
    plain = jpeg.encode_bytes_opts(img, quality=85)
    batch = jt.transform_batch([src, plain], "rot90")
    assert batch[0] == out
    assert batch[1] == jt.transform_bytes(plain, "rot90")


def test_crop_lossless():
    # Component samples inside the crop are the EXACT slices of the
    # original's; full pixels equal the uncropped decode's region except
    # where the crop creates a new chroma edge (crop to the image's own
    # right/bottom edges -> fully pixel-exact).
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    # 4:4:4 (no resampling): pixel-exact at ANY aligned origin/size.
    d444 = jpeg.encode_bytes_opts(img, quality=85, subsampling="444")
    out = jt.crop_bytes(d444, 16, 8, 33, 17)
    np.testing.assert_array_equal(
        jpeg.decode_bytes(out), jpeg.decode_bytes(d444)[8:25, 16:49])
    # 4:2:0: new crop edges change the chroma upsampler's context
    # (replication where the original had real neighbors), so pixel
    # differences are confined to the one-pixel edge ring; the interior
    # is exact.
    data = jpeg.encode_bytes_opts(img, quality=85, subsampling="420")
    out = jt.crop_bytes(data, 16, 16, 48, 32)
    a = jpeg.decode_bytes(out).astype(int)
    b = jpeg.decode_bytes(data)[16:48, 16:64].astype(int)
    np.testing.assert_array_equal(a[2:-2, 2:-2], b[2:-2, 2:-2])
    assert np.abs(a - b).max() <= 40  # edge-ring chroma context only
    # Interior crop with odd size: per-component samples exact.
    out = jt.crop_bytes(data, 16, 16, 33, 17)
    ci = jpeg.read_coefficients(data)
    co = jpeg.read_coefficients(out)
    assert (co.width, co.height) == (33, 17)
    for a, b in zip(ci.components, co.components):
        sa = np.asarray(jd.idct8x8_islow(jnp.asarray(a.coefs), a.qtable))
        sb = np.asarray(jd.idct8x8_islow(jnp.asarray(b.coefs), b.qtable))
        fx = a.h_samp * 16 // ci.max_h
        fy = a.v_samp * 16 // ci.max_v
        dh, dw = _dims(co, b)
        np.testing.assert_array_equal(
            sb[:dh, :dw], sa[fy:fy + dh, fx:fx + dw])
    # Misaligned origin refused; grayscale works; markers survive.
    with pytest.raises(ValueError, match="iMCU-aligned"):
        jt.crop_bytes(data, 8, 0, 16, 16)
    gray = jpeg.encode_bytes_opts(
        rng.integers(0, 256, (32, 32, 1), np.uint8), quality=85)
    gout = jt.crop_bytes(gray, 8, 8, 16, 16)
    np.testing.assert_array_equal(
        jpeg.decode_bytes(gout), jpeg.decode_bytes(gray)[8:24, 8:24])
    co0 = jpeg.read_coefficients(data)
    marked = jpeg.write_coefficients(
        [c.coefs for c in co0.components], 64, 48, quality=85,
        subsampling="420", markers=[(0xFE, b"note")])
    assert jpeg.read_markers(jt.crop_bytes(marked, 0, 0, 32, 32)) == \
        [(0xFE, b"note")]


def test_fill_bytes_before_marker_detected():
    # Spec-legal 0xFF fill padding before a marker code must not hide
    # metadata from the batch path's cheap scan.
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    co = jpeg.read_coefficients(jpeg.encode_bytes_opts(img, quality=85))
    src = jpeg.write_coefficients([c.coefs for c in co.components], 16, 16,
                                  quality=85, markers=[(0xFE, b"m")])
    # Inject a fill byte before the COM marker (FF FE -> FF FF FE).
    i = src.index(b"\xff\xfe")
    padded = src[:i] + b"\xff" + src[i:]
    assert jpeg.read_markers(padded) == [(0xFE, b"m")]
    out = jt.transform_batch([padded], "rot180")[0]
    assert jpeg.read_markers(out) == [(0xFE, b"m")]


def test_distinct_chroma_tables_refused():
    # A stream whose Cb and Cr use different quant tables cannot be
    # rewritten by the two-slot writer; must refuse, never corrupt Cr.
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    co = jpeg.read_coefficients(jpeg.encode_bytes_opts(img, quality=85))
    qt = [np.asarray(c.qtable, np.uint16) for c in co.components]
    qt[2] = qt[2].copy()
    qt[2][0] += 1
    with pytest.raises(ValueError, match="different quant tables"):
        jpeg.write_coefficients([c.coefs for c in co.components], 16, 16,
                                quality=85, qtables=qt)


@pytest.mark.parametrize("dims,sub", [((48, 64), "420"), ((41, 53), "422"),
                                      ((23, 17), "444"), ((40, 56), "440")])
def test_grayscale_drop_lossless(dims, sub):
    """jpegtran -grayscale: chroma dropped, luma coefficients verbatim.

    The exact oracle: decoding the grayscale output must equal libjpeg's
    JCS_GRAYSCALE decode of the ORIGINAL color stream (both run the
    identical Y-only path on identical coefficients). Odd dims exercise
    the iMCU-padding trim (4:2:0 pads Y to 16-pixel iMCUs; a gray
    stream's iMCU is one block).
    """
    h, w = dims
    data = _stream(h, w, sub=sub, seed=31)
    out = jt.transform_bytes(data, "grayscale")
    got = jpeg.decode_bytes(out)
    want = jpeg.decode_bytes(data, force_gray=True)
    np.testing.assert_array_equal(got, want)
    co = jpeg.read_coefficients(out)
    assert co.num_components == 1
    # Luma coefficients pass through untouched (trim only).
    ci = jpeg.read_coefficients(data)
    hb, wb = -(-h // 8), -(-w // 8)
    np.testing.assert_array_equal(
        co.components[0].coefs[:hb, :wb],
        ci.components[0].coefs[:hb, :wb],
    )
    np.testing.assert_array_equal(co.components[0].qtable,
                                  ci.components[0].qtable)


def test_grayscale_batch_markers_and_progressive():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    co = jpeg.read_coefficients(jpeg.encode_bytes_opts(img, quality=85))
    mks = [(0xE1, b"Exif\x00\x00GRAY"), (0xFE, b"note")]
    src = jpeg.write_coefficients([c.coefs for c in co.components], 32, 24,
                                  quality=85, markers=mks)
    out = jt.transform_bytes(src, "grayscale")
    assert jpeg.read_markers(out) == mks
    # Progressive source entropy-decodes the same coefficients.
    prog = _stream(24, 32, seed=34, progressive=True)
    np.testing.assert_array_equal(
        jpeg.decode_bytes(jt.transform_bytes(prog, "grayscale")),
        jpeg.decode_bytes(prog, force_gray=True),
    )
    # Batch path == singles.
    plain = [_stream(24, 32, seed=s) for s in (35, 36)]
    batch = jt.transform_batch(plain, "grayscale")
    assert batch == [jt.transform_bytes(p, "grayscale") for p in plain]
