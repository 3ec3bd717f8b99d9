"""Partitioner geometry vs the reference's documented behavior."""

import math

import pytest

from hipe_tpu.parallel import partitioner as pt


def test_defaults_match_reference():
    # heterogeneous_blur.c:44-48
    assert pt.NUM_IMAGES == 5000
    assert pt.DEFAULT_RATIO == 0.5
    assert pt.DEFAULT_BATCH == 500


@pytest.mark.parametrize("bad", [-0.1, 1.5, 2.0])
def test_ratio_fallback(bad):
    assert pt.validate_ratio(bad, warn=False) == 0.5


@pytest.mark.parametrize("bad", [0, -5, 5001])
def test_batch_fallback(bad):
    assert pt.validate_batch(bad, warn=False) == 500


def test_num_batches_ceil():
    # 5000 images / batch 35 -> 143 batches (35_run_1.txt banner)
    assert pt.num_batches(5000, 35) == 143
    assert pt.num_batches(5000, 500) == 10
    assert pt.num_batches(5000, 1200) == 5


def test_split_images_matches_reference_log():
    # ratio 0.728, batch 35: CPU processed 1429 of 5000, GPU 3571
    # (data/approach1/35_run_1.txt sections 2-3)
    total_cpu = total_gpu = 0
    remaining = 5000
    while remaining:
        bc = min(35, remaining)
        c, g = pt.split_images(bc, 0.728)
        total_cpu += c
        total_gpu += g
        remaining -= bc
    assert total_cpu == 1429 and total_gpu == 3571


def test_row_split_matches_reference_log():
    # ratio 0.837, H=240, halo=1: split_row=39, CPU 40 in/39 out rows,
    # GPU 202 in/201 out rows (data/approach2/2_35_run_1.txt banner)
    rs = pt.row_split(240, 0.837, halo=1)
    assert rs.split_row == 39
    assert rs.cpu_input_rows == 40 and rs.cpu_output_rows == 39
    assert rs.gpu_input_rows == 202 and rs.gpu_output_rows == 201
    assert rs.cpu_in == (0, 40) and rs.gpu_in == (38, 240)


@pytest.mark.parametrize("ratio", [0.0, 1.0, 0.999, 0.001])
def test_row_split_clamping(ratio):
    # split_image_blur.c:147-154 — clamp to [halo, H-halo]
    rs = pt.row_split(100, ratio, halo=2)
    assert 2 <= rs.split_row <= 98


def test_row_split_coverage_and_halo():
    for ratio in [0.1, 0.33, 0.5, 0.75, 0.9]:
        rs = pt.row_split(97, ratio, halo=1)
        # outputs tile the image exactly
        assert rs.cpu_out[0] == 0 and rs.gpu_out[1] == 97
        assert rs.cpu_out[1] == rs.gpu_out[0] == rs.split_row
        # each input covers its output plus halo
        assert rs.cpu_in[1] >= rs.cpu_out[1] + 1 or rs.cpu_in[1] == 97
        assert rs.gpu_in[0] <= rs.gpu_out[0] - 1 or rs.gpu_in[0] == 0


def test_even_row_shards():
    shards = pt.even_row_shards(256, 8, halo=1)
    assert shards[0] == (0, 32) and shards[-1] == (224, 256)
    assert len(shards) == 8


def test_recommend_ratio_formula():
    # README.md:93, and 35_run_1.txt section 8: 0.285/0.104 -> 73.2%
    # the log's 0.285/0.104 are rounded to 3 decimals, so allow 1e-3 slack
    r = pt.recommend_ratio(0.285, 0.104)
    assert math.isclose(r, 0.732, abs_tol=1e-3)
    assert pt.recommend_ratio(0.0, 0.0) == 0.5


def test_imbalance():
    assert pt.imbalance_pct(100.0, 100.0) == 0.0
    assert math.isclose(pt.imbalance_pct(406.88, 371.71), 8.6, abs_tol=0.1)
