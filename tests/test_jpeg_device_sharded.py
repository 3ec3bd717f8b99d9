"""Device JPEG codec under SPMD batch sharding on the virtual mesh.

The codec stages (decode_planes / encode_planes) are elementwise over the
leading batch axis, so a coefficient stream shards across a data-parallel
mesh with plain NamedSharding — the multi-chip serving story for the
transcode path. Outputs must stay bit-identical to the unsharded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hipe_tpu.io_ import jpeg
from hipe_tpu.ops import jpeg_decode as jd
from hipe_tpu.ops import jpeg_encode as je
from hipe_tpu.parallel import mesh as meshlib

if not jpeg.native_available():  # pragma: no cover
    pytest.skip("native libjpeg codec unavailable", allow_module_level=True)


def _coef_batch(n=8, h=32, w=48, quality=85):
    rng = np.random.default_rng(0)
    cos = [
        jpeg.read_coefficients(
            jpeg.encode_bytes_opts(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
                quality=quality, subsampling="420",
            )
        )
        for _ in range(n)
    ]
    geo = jd.geometry_of(cos[0])
    qt = [c.qtable for c in cos[0].components]
    comp_batches = [
        np.stack([co.components[ci].coefs for co in cos])
        for ci in range(3)
    ]
    return geo, qt, comp_batches


def test_decode_batch_sharded_matches_unsharded():
    mesh = meshlib.make_mesh(8, axis="batch")
    geo, qt, comp_batches = _coef_batch()
    want = np.asarray(jd.decode_planes(geo, [jnp.asarray(c) for c in comp_batches], qt))

    sharding = NamedSharding(mesh, P("batch"))
    sharded = [jax.device_put(c, sharding) for c in comp_batches]

    @jax.jit
    def run(*cs):
        return jd.decode_planes(geo, list(cs), qt)

    out = run(*sharded)
    # The output batch axis stays sharded over the mesh.
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), want)


def test_transcode_batch_sharded_matches_unsharded():
    mesh = meshlib.make_mesh(8, axis="batch")
    geo, qt, comp_batches = _coef_batch()
    h, w = geo.height, geo.width
    enc_geo = je.encode_geometry(h, w, 3, "420")
    luma, chroma = jpeg.quality_tables(85)
    enc_qt = [luma, chroma, chroma]

    def transcode(*cs):
        rgb = jd.decode_planes(geo, list(cs), qt)
        return tuple(je.encode_planes(enc_geo, rgb, enc_qt))

    want = [np.asarray(x) for x in
            transcode(*[jnp.asarray(c) for c in comp_batches])]

    sharding = NamedSharding(mesh, P("batch"))
    sharded = [jax.device_put(c, sharding) for c in comp_batches]
    out = jax.jit(transcode)(*sharded)
    for got, w_ in zip(out, want):
        assert len(got.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(got), w_)
    # And the entropy writer accepts the gathered per-image grids.
    files = [
        jpeg.write_coefficients(
            [np.asarray(c)[i] for c in out], w, h, quality=85,
            subsampling="420",
        )
        for i in (0, 7)
    ]
    assert all(f[:2] == b"\xff\xd8" for f in files)


def test_scaled_decode_batch_sharded_matches_unsharded():
    """The thumbnail (1/8 DCT-domain) decode shards like the full path —
    the multi-chip story for thumbnail serving."""
    mesh = meshlib.make_mesh(8, axis="batch")
    geo, qt, comp_batches = _coef_batch()
    want = np.asarray(jd.decode_planes_scaled(
        geo, [jnp.asarray(c) for c in comp_batches], qt, 8))

    sharding = NamedSharding(mesh, P("batch"))
    sharded = [jax.device_put(c, sharding) for c in comp_batches]

    @jax.jit
    def run(*cs):
        return jd.decode_planes_scaled(geo, list(cs), qt, 8)

    out = run(*sharded)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), want)


def test_cmyk_decode_batch_sharded_matches_unsharded():
    """4-component (YCCK) decode under DP sharding, bit-identical."""
    mesh = meshlib.make_mesh(8, axis="batch")
    rng = np.random.default_rng(5)
    cos = [
        jpeg.read_coefficients(
            jpeg.encode_cmyk_bytes(
                rng.integers(0, 256, (32, 40, 4), dtype=np.uint8),
                quality=85, ycck=True,
            )
        )
        for _ in range(8)
    ]
    geo = jd.geometry_of(cos[0])
    qt = [c.qtable for c in cos[0].components]
    comp_batches = [
        np.stack([co.components[ci].coefs for co in cos])
        for ci in range(4)
    ]
    want = np.asarray(jd.decode_planes(
        geo, [jnp.asarray(c) for c in comp_batches], qt))

    sharding = NamedSharding(mesh, P("batch"))
    sharded = [jax.device_put(c, sharding) for c in comp_batches]
    out = jax.jit(lambda *cs: jd.decode_planes(geo, list(cs), qt))(*sharded)
    assert len(out.sharding.device_set) == 8
    assert out.shape[-1] == 4
    np.testing.assert_array_equal(np.asarray(out), want)


def test_lossless_transform_sharded_matches_unsharded():
    # The DCT-domain transform tensor ops are elementwise over the batch
    # axis too: a sharded rot90 must match the unsharded one bit-for-bit.
    from hipe_tpu.ops import jpeg_transform as jt

    geo, qt, comp_batches = _coef_batch(n=8)
    mesh = meshlib.make_mesh(8)
    sharding = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    fn = jax.jit(lambda c: jt.transform_component(c, "rot90"))
    for cb in comp_batches:
        want = np.asarray(fn(jnp.asarray(cb)))
        got = np.asarray(fn(jax.device_put(cb, sharding)))
        np.testing.assert_array_equal(got, want)
