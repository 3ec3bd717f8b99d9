"""Image layout utilities and stream simulation.

The reference decodes one JPEG with CImg (planar storage) and converts it to
interleaved RGB on the host (`/root/reference/heterogeneous_blur.c:106-137`),
then simulates a 5000-image stream by memcpy-replicating that image into each
batch (`heterogeneous_blur.c:431-442`). This module provides the TPU-native
equivalents: NHWC<->planar conversion (the TPU kernels prefer planar (N*C, H,
W) tiles, see `hipe_tpu.ops.pallas_blur`), and batched stream replication.
"""

from __future__ import annotations

import numpy as np

REFERENCE_DIR = "/root/reference"
DEFAULT_IMAGE_320 = f"{REFERENCE_DIR}/image_320x240.jpg"
DEFAULT_IMAGE_256 = f"{REFERENCE_DIR}/image_256x256.jpg"


def hwc_to_planar(batch: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> (B*C, H, W): one contiguous plane per image-channel."""
    b, h, w, c = batch.shape
    return np.ascontiguousarray(batch.transpose(0, 3, 1, 2)).reshape(b * c, h, w)


def planar_to_hwc(planes: np.ndarray, channels: int) -> np.ndarray:
    """(B*C, H, W) -> (B, H, W, C); inverse of :func:`hwc_to_planar`."""
    n, h, w = planes.shape
    b = n // channels
    return np.ascontiguousarray(planes.reshape(b, channels, h, w).transpose(0, 2, 3, 1))


def replicate_stream(image: np.ndarray, count: int) -> np.ndarray:
    """Simulate an image stream by replication (heterogeneous_blur.c:431-442)."""
    return np.broadcast_to(image, (count,) + image.shape)


def load_test_image(path: str = DEFAULT_IMAGE_256) -> np.ndarray:
    """Decode a JPEG to HWC uint8 via the framework codec (PIL fallback)."""
    from hipe_tpu.io_.jpeg import decode_file

    return decode_file(path)


def checker_image(h: int = 64, w: int = 64, c: int = 3, seed: int = 0) -> np.ndarray:
    """Deterministic random uint8 test image (no file IO needed)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
