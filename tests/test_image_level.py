"""Image-level (DP) sharding over the mesh == unsharded results."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.ops import reference as oracle
from hipe_tpu.parallel import mesh as meshlib
from hipe_tpu.parallel.image_level import make_image_level_fn, shard_batch
from hipe_tpu.utils.images import checker_image


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_dp_blur_exact(n_dev):
    mesh = meshlib.make_mesh(n_dev)
    batch = np.stack([checker_image(24, 32, 3, seed=s) for s in range(8)])
    fn = make_image_level_fn(mesh, ("gaussian3",))
    got = np.asarray(fn(shard_batch(jnp.asarray(batch), mesh)))
    want = np.stack([oracle.gaussian_blur_int_oracle(b) for b in batch])
    np.testing.assert_array_equal(got, want)


def test_dp_sharding_layout():
    mesh = meshlib.make_mesh(8)
    batch = np.zeros((16, 8, 8, 3), np.uint8)
    x = shard_batch(jnp.asarray(batch), mesh)
    # each device holds 16/8 = 2 images
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_dp_chain():
    mesh = meshlib.make_mesh(4)
    batch = np.stack([checker_image(16, 24, 3, seed=s) for s in range(4)])
    fn = make_image_level_fn(mesh, ("gaussian3", "sharpen", "edge"))
    got = np.asarray(fn(shard_batch(jnp.asarray(batch), mesh)))
    want = np.stack(
        [
            oracle.sobel_edge_oracle(
                oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(b))
            )
            for b in batch
        ]
    )
    np.testing.assert_array_equal(got, want)
