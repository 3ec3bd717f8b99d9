"""Layout utilities and device discovery."""

import numpy as np
import pytest

from hipe_tpu.parallel import mesh as meshlib
from hipe_tpu.utils.images import (
    checker_image,
    hwc_to_planar,
    planar_to_hwc,
    replicate_stream,
)


def test_planar_roundtrip():
    batch = np.stack([checker_image(8, 12, 3, seed=s) for s in range(4)])
    planes = hwc_to_planar(batch)
    assert planes.shape == (12, 8, 12)
    # plane ordering: image-major, channel-minor
    np.testing.assert_array_equal(planes[0], batch[0, :, :, 0])
    np.testing.assert_array_equal(planes[5], batch[1, :, :, 2])
    np.testing.assert_array_equal(planar_to_hwc(planes, 3), batch)


def test_replicate_stream_zero_copy():
    img = checker_image(4, 4, 3)
    s = replicate_stream(img, 100)
    assert s.shape == (100, 4, 4, 3)
    assert s.strides[0] == 0  # broadcast view, no copy
    np.testing.assert_array_equal(s[99], img)


def test_discovery_inventory():
    inv = meshlib.discover()
    assert inv.cpu_devices, "cpu backend must exist"
    text = inv.describe()
    assert "Platform 0" in text and "CPU device" in text


def test_require_device_missing_raises():
    inv = meshlib.DeviceInventory(cpu_devices=[], accel_devices=[],
                                  accel_platform=None)
    with pytest.raises(RuntimeError, match="no cpu device"):
        meshlib.require_device(inv, "cpu")
    with pytest.raises(RuntimeError, match="no accel device"):
        meshlib.require_device(inv, "accel")


def test_mesh_builders():
    m1 = meshlib.make_mesh(4)
    assert m1.devices.shape == (4,) and m1.axis_names == (meshlib.DATA_AXIS,)
    m2 = meshlib.make_mesh_2d(2, 4)
    assert m2.devices.shape == (2, 4)
    assert m2.axis_names == (meshlib.DATA_AXIS, meshlib.ROW_AXIS)


def test_stage_clock_accumulation():
    import time

    from hipe_tpu.profiling.events import DeviceCounters, StageClock

    c = DeviceCounters("cpu")
    clock = StageClock(c)
    with clock.stage("in"):
        time.sleep(0.01)
    with clock.stage("kernel"):
        time.sleep(0.02)
    with clock.stage("out"):
        pass
    assert c.in_ms >= 8 and c.kernel_ms >= 15 and c.out_ms >= 0
    assert abs(c.total_ms - (c.in_ms + c.kernel_ms + c.out_ms)) < 1e-9
    c2 = DeviceCounters("cpu")
    c2.units = 5
    c2.images = 5
    c2.in_ms = 10.0
    c.merge(c2)
    assert c.units == 5 and c.in_ms >= 18
