"""N-lane fleet executor on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from hipe_tpu.ops import reference as oracle
from hipe_tpu.parallel import partitioner as pt
from hipe_tpu.runtime.fleet import FleetEngine, LaneSpec
from hipe_tpu.utils.images import checker_image

IMG = checker_image(40, 32, 3, seed=0)


def _lanes(n, weights=None):
    devs = jax.devices("cpu")[:n]
    weights = weights or [1.0] * n
    return [LaneSpec(device=d, weight=w, name=f"cpu{i}")
            for i, (d, w) in enumerate(zip(devs, weights))]


def test_apportion_matches_two_way_reference_split():
    # weights (1-r, r): fast lane gets floor(total*r), like split_images
    for bc in (35, 50, 101):
        for r in (0.728, 0.5, 0.837):
            cpu, gpu = pt.split_images(bc, r)
            got = pt.apportion(bc, [1.0 - r, r])
            assert got[1] in (gpu, gpu + 1)  # largest remainder may round up
            assert sum(got) == bc


def test_apportion_exact():
    assert pt.apportion(10, [1, 1, 1, 1]) == [3, 3, 2, 2]
    assert sum(pt.apportion(5000, [0.2, 0.3, 0.5])) == 5000
    assert pt.apportion(4, [0, 1]) == [0, 4]


def test_row_partition_covers_and_halos():
    segs = pt.row_partition(97, [1, 2, 3, 1], halo=2)
    assert segs[0].out[0] == 0 and segs[-1].out[1] == 97
    for a, b in zip(segs, segs[1:]):
        assert a.out[1] == b.out[0]
    for seg in segs:
        assert seg.inp[0] == max(seg.out[0] - 2, 0)
        assert seg.inp[1] == min(seg.out[1] + 2, 97)


def test_recommend_weights_inverse_time():
    w = pt.recommend_weights([2.0, 1.0, 1.0])  # inv: 0.5,1,1 -> /2.5
    assert abs(w[0] - 0.2) < 1e-9 and abs(w[1] - 0.4) < 1e-9
    # two-lane form == reference ratio formula
    r2 = pt.recommend_weights([0.285, 0.104])
    assert abs(r2[1] - pt.recommend_ratio(0.285, 0.104)) < 1e-9


@pytest.mark.parametrize("n_lanes", [1, 3, 4])
def test_fleet_images_accounting_and_output(n_lanes):
    eng = FleetEngine(_lanes(n_lanes), approach=1, batch_size=12,
                      num_images=24)
    stats = eng.run(image=IMG)
    assert sum(c.images for c in stats.lanes) == 24
    want = oracle.gaussian_blur_int_oracle(IMG)
    assert eng.first_output.shape == (12,) + want.shape
    for img_out in eng.first_output:
        np.testing.assert_array_equal(img_out, want)
    assert "Recommended weights" in eng.report()


def test_fleet_rows_seam_exact():
    eng = FleetEngine(_lanes(4, weights=[1, 3, 2, 2]), approach=2,
                      batch_size=6, num_images=12, pipeline="chain")
    eng.run(image=IMG)
    want = oracle.sobel_edge_oracle(
        oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(IMG))
    )
    assert eng.first_output.shape == (6,) + want.shape
    np.testing.assert_array_equal(eng.first_output[0], want)


def test_fleet_rows_units_accounting():
    eng = FleetEngine(_lanes(2, weights=[1, 1]), approach=2, batch_size=4,
                      num_images=8)
    stats = eng.run(image=IMG)
    assert stats.lanes[0].units == 8 * 20
    assert stats.lanes[1].units == 8 * 20
    assert all(c.images == 8 for c in stats.lanes)


def test_fleet_pipelined_depth2_equivalent():
    for approach in (1, 2):
        e1 = FleetEngine(_lanes(3), approach=approach, batch_size=4,
                         num_images=12)
        e2 = FleetEngine(_lanes(3), approach=approach, batch_size=4,
                         num_images=12, pipeline_depth=2)
        e1.run(image=IMG)
        e2.run(image=IMG)
        np.testing.assert_array_equal(e1.first_output, e2.first_output)
        assert [c.units for c in e1.stats.lanes] == \
               [c.units for c in e2.stats.lanes]


def test_fleet_csv_row_contract():
    """Fleet runs emit per_run.csv-schema rows (two-group aggregation)."""
    from hipe_tpu.profiling.report import CSV_COLUMNS

    eng = FleetEngine(_lanes(3, weights=[1, 2, 1]), approach=1,
                      batch_size=12, num_images=24)
    eng.run(image=IMG)
    row = eng.to_csv_row(run=2, file="fleet_test")
    assert set(row) == set(CSV_COLUMNS)
    assert row["run"] == 2 and row["images"] == 24
    # all lanes here are cpu-platform -> aggregated into the cpu group
    assert row["cpu_images"] == 24 and row["gpu_images"] == 0
    rs = eng.to_run_stats()
    assert rs.mode == "cpu"
    assert rs.cpu.units == sum(c.units for c in eng.stats.lanes)
    assert abs(rs.cpu.total_ms
               - sum(c.total_ms for c in eng.stats.lanes)) < 1e-9


# ---- greedy scheduling + elastic recovery, generalized to N lanes ----


def test_fleet_greedy_accounts_all_batches_and_bounds_imbalance():
    """3-lane greedy: all images processed exactly once, outputs exact,
    and the self-balancing split keeps lane work within ~one batch."""
    eng = FleetEngine(_lanes(3), approach=1, batch_size=5, num_images=60,
                      scheduler="greedy", profile=False)
    stats = eng.run(image=IMG)
    assert sum(c.images for c in stats.lanes) == 60
    want = oracle.gaussian_blur_int_oracle(IMG)
    np.testing.assert_array_equal(eng.first_output[0], want)
    # Participation property: greedy keeps every lane fed. The tight
    # one-batch imbalance bound only holds with genuinely parallel
    # lanes; on this harness all three "equal" lanes share ONE physical
    # core, and OS scheduling occasionally starves a thread for several
    # batches (observed spreads 0-25 images over repeated runs), so the
    # unit test asserts participation plus a loose ceiling — the real
    # imbalance claim is measured on hardware (benchmarks/full_scale
    # fleet logs, FINDINGS scheduler study: 9.7% greedy vs 62% static).
    assert all(c.images > 0 for c in stats.lanes)
    assert max(c.images for c in stats.lanes) <= 60 - 2 * 5


def test_fleet_greedy_elastic_survives_lane_kill():
    """A lane dying mid-run (3+ lanes): its batch is redistributed, the
    run completes, and the dead lane pollutes no accounting."""
    import time

    eng = FleetEngine(_lanes(3), approach=1, batch_size=4, num_images=40,
                      scheduler="greedy", elastic=True, profile=False)

    def flaky(batch):
        raise RuntimeError("device lost")

    eng._lanes[1].process = flaky
    for lane in (eng._lanes[0], eng._lanes[2]):
        orig = lane.process

        def slow(batch, orig=orig):
            time.sleep(0.005)
            return orig(batch)

        lane.process = slow
    stats = eng.run(image=IMG)
    assert sum(c.images for c in stats.lanes) == 40
    assert stats.lanes[1].images == 0 and stats.lanes[1].total_ms == 0.0
    want = oracle.gaussian_blur_int_oracle(IMG)
    np.testing.assert_array_equal(eng.first_output[0], want)


def test_fleet_greedy_fail_fast_without_elastic():
    eng = FleetEngine(_lanes(3), approach=1, batch_size=4, num_images=24,
                      scheduler="greedy", profile=False)

    def flaky(batch):
        raise RuntimeError("device lost")

    for lane in eng._lanes:
        lane.process = flaky
    with pytest.raises(RuntimeError, match="device lost"):
        eng.run(image=IMG)


def test_fleet_greedy_approach2_warns_and_defaults():
    eng = FleetEngine(_lanes(2), approach=2, scheduler="greedy",
                      elastic=True)
    assert eng.scheduler == "static" and eng.elastic is False


def test_generator_stream_is_materialized_once():
    # A one-shot iterable must survive the geometry scan + warmup and
    # actually be processed (it used to be silently exhausted).
    from hipe_tpu.runtime.engine import Engine, EngineConfig

    batches = (np.stack([IMG] * 4) for _ in range(3))
    eng = FleetEngine(_lanes(2), approach=1, batch_size=4, num_images=12)
    stats = eng.run(stream=batches)
    assert sum(c.images for c in stats.lanes) == 12
