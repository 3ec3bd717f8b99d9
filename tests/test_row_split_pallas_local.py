"""Row-split with a custom (Pallas-style) halo-consuming local_fn."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.models import pipelines as plib
from hipe_tpu.ops import reference as oracle
from hipe_tpu.parallel import mesh as meshlib
from hipe_tpu.parallel.row_split import make_row_split_fn
from hipe_tpu.utils.images import checker_image


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("name,radius_fn", [
    ("blur3", lambda b: oracle.gaussian_blur_int_oracle(b, 1)),
    ("blur5", lambda b: oracle.gaussian_blur_int_oracle(b, 2)),
])
def test_halo_local_fn_interpret_pallas(n_shards, name, radius_fn):
    pipe = plib.PIPELINES[name]
    mesh = meshlib.make_mesh(n_shards, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh,
        local_fn=pipe.nhwc_halo_fn(use_pallas=True, interpret=True),
        radius=pipe.radius,
    )
    batch = np.stack([checker_image(64, 128, 3, seed=s) for s in range(2)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = np.stack([radius_fn(b) for b in batch])
    np.testing.assert_array_equal(got, want)


def test_halo_local_fn_xla_path():
    pipe = plib.PIPELINES["blur3"]
    mesh = meshlib.make_mesh(8, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh, local_fn=pipe.nhwc_halo_fn(use_pallas=False), radius=pipe.radius
    )
    batch = np.stack([checker_image(32, 48, 3, seed=7)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = np.stack([oracle.gaussian_blur_int_oracle(batch[0])])
    np.testing.assert_array_equal(got, want)
