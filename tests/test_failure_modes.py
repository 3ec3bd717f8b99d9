"""Failure handling: fail-fast discovery, codec fallback (SURVEY.md §5)."""

import numpy as np
import pytest

from hipe_tpu.io_ import jpeg
from hipe_tpu.runtime.engine import Engine, EngineConfig
from hipe_tpu.utils.images import checker_image


def test_engine_fails_fast_without_accelerator(monkeypatch):
    """mode='both' with no accelerator aborts, like the reference's
    discovery hard-fail (heterogeneous_blur.c:181-184)."""
    from hipe_tpu.parallel import mesh as meshlib

    monkeypatch.setattr(
        meshlib,
        "discover",
        lambda: meshlib.DeviceInventory(
            cpu_devices=meshlib.discover.__wrapped__()
            if hasattr(meshlib.discover, "__wrapped__")
            else [],
            accel_devices=[],
            accel_platform=None,
        ),
    )
    # re-import to pick up the patched discover used inside Engine.__init__
    import jax

    cpu = jax.devices("cpu")[0]
    with pytest.raises(RuntimeError, match="no accel device"):
        Engine(EngineConfig(mode="both"), cpu_device=cpu)


def test_jpeg_pil_fallback(monkeypatch):
    """With the native codec unavailable, PIL fallback stays functional."""
    monkeypatch.setattr(jpeg, "_load", lambda: None)
    img = checker_image(16, 16, 3, seed=0)
    payload = jpeg.encode_bytes(img, quality=95)
    out = jpeg.decode_bytes(payload)
    assert out.shape == img.shape and out.dtype == np.uint8
    batch = jpeg.decode_batch([payload] * 3)
    assert batch.shape == (3, 16, 16, 3)


def test_approach2_rejects_single_device_mode():
    with pytest.raises(AssertionError, match="approach 2"):
        EngineConfig(approach=2, mode="cpu").validate()
