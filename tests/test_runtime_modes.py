"""Device-resident stream runner and the fused serving pipeline."""

import numpy as np

from hipe_tpu.io_.jpeg import decode_bytes, encode_bytes
from hipe_tpu.ops import reference as oracle
from hipe_tpu.runtime.device_stream import DeviceStreamRunner
from hipe_tpu.runtime.serve import ServingPipeline
from hipe_tpu.utils.images import checker_image


def test_device_stream_runner_verify_and_throughput():
    img = checker_image(32, 128, 3, seed=0)
    runner = DeviceStreamRunner("blur3", num_images=8, image=img,
                                use_pallas=False)
    assert runner.verify_max_abs_err() == 0
    res = runner.measure_throughput(passes=2, reps=1)
    assert res["img_per_s"] > 0 and res["per_pass_s"] > 0


def test_device_stream_runner_chain_pipeline():
    img = checker_image(32, 128, 3, seed=1)
    runner = DeviceStreamRunner("chain", num_images=4, image=img,
                                use_pallas=False)
    assert runner.verify_max_abs_err() == 0


def test_serving_pipeline_decode_filter_encode():
    img = checker_image(24, 32, 3, seed=2)
    payloads = [encode_bytes(img, quality=100)] * 5
    serve = ServingPipeline("blur3", use_pallas=False)
    out = serve.process_batch(payloads, encode=False)
    # The decoded input is JPEG-lossy; the filter itself must match the
    # oracle applied to the decoded pixels exactly.
    decoded = decode_bytes(payloads[0])
    want = oracle.gaussian_blur_int_oracle(decoded)
    np.testing.assert_array_equal(out[0], want)


def test_serving_pipeline_device_decode_matches_host_path():
    # decode_on_device (host entropy decode + on-device IDCT/upsample/color,
    # fused with the filter) must produce byte-identical batches to the
    # host-codec path for any pipeline.
    img = checker_image(24, 40, 3, seed=7)
    payloads = [encode_bytes(img, quality=85)] * 4
    host_serve = ServingPipeline("chain", use_pallas=False)
    dev_serve = ServingPipeline("chain", use_pallas=False,
                                decode_on_device=True)
    want = host_serve.process_batch(payloads, encode=False)
    got = dev_serve.process_batch(payloads, encode=False)
    np.testing.assert_array_equal(got, want)
    assert dev_serve.stats.images == 0  # process_batch doesn't count stream
    # Streaming mode with the same fused path.
    got_stream = list(dev_serve.run([payloads, payloads], encode=False))
    np.testing.assert_array_equal(got_stream[0], want)
    np.testing.assert_array_equal(got_stream[1], want)
    assert dev_serve.stats.images == 8
    assert len(dev_serve._fused_fns) == 1  # one geometry+qtable group


def test_serving_pipeline_streaming_mixed_resolution():
    a = checker_image(16, 24, 3, seed=3)
    b = checker_image(24, 32, 3, seed=4)
    batches = [
        [encode_bytes(a)] * 3,
        [encode_bytes(b)] * 2,
        [encode_bytes(a)] * 3,
    ]
    serve = ServingPipeline("blur3", use_pallas=False)
    results = list(serve.run(batches, encode=True))
    assert [len(r) for r in results] == [3, 2, 3]
    # outputs decode back to the right shapes
    assert decode_bytes(results[0][0]).shape == a.shape
    assert decode_bytes(results[1][0]).shape == b.shape
    assert serve.stats.images == 8
    assert serve.stats.wall_ms > 0
    # per-shape jit cache has exactly the two resolutions
    assert len(serve._fns) == 2


def test_autotune_skips_block_sweep_on_tiled_geometry(tmp_path):
    """Oversized planes route to tiled kernels (no alias/block knobs):
    autotune must not sweep fictitious alias/block configs there, and
    must skip configs that fail to compile (TPU kernels on this CPU
    backend) instead of crashing — recording each skip with its
    exception class rather than hiding it."""
    img = checker_image(2049, 1025, 3, seed=0)
    r = DeviceStreamRunner("blur3", num_images=1, image=img,
                           use_pallas=True,
                           tune_cache_path=str(tmp_path / "tune.json"))
    from hipe_tpu.models.pipelines import Pipeline

    assert Pipeline.routes_tiled(*r.shape[:2])
    timings = r.autotune(passes=1, reps=1)
    assert not any("alias" in label for label in timings)
    assert r.tuning["chosen"] == "xla"  # only compilable config here
    # The Pallas config failed on this CPU backend: reported, not hidden.
    assert "pallas" in r.tuning["skipped"]
    assert r.tuning["skipped"]["pallas"]  # exception class name recorded


def test_autotune_cache_hit_skips_sweep(tmp_path, capsys, monkeypatch):
    """Second run re-verifies the persisted winner with one timing and
    skips the sweep; --retune forces a fresh sweep."""
    # The regression re-sweep is timing-triggered by design; under a
    # loaded CI host the microsecond-scale CPU timings here jitter well
    # past the production factor, so pin a huge one — the cache-hit
    # mechanics under test are timing-independent (the regression PATH
    # has its own test below).
    from hipe_tpu.runtime import device_stream as ds

    monkeypatch.setattr(ds, "_RETUNE_FACTOR", 1e9)
    img = checker_image(32, 128, 3, seed=0)
    path = str(tmp_path / "tune.json")
    r = DeviceStreamRunner("blur3", num_images=4, image=img,
                           use_pallas=False, tune_cache_path=path)
    first = r.autotune(passes=1, reps=1)
    assert r.tuning["cache_hit"] is False
    chosen = r.tuning["chosen"]
    assert len(first) >= 1

    r2 = DeviceStreamRunner("blur3", num_images=4, image=img,
                            use_pallas=False, tune_cache_path=path)
    second = r2.autotune(passes=1, reps=1)
    assert r2.tuning["cache_hit"] is True
    assert r2.tuning["chosen"] == chosen
    assert list(second) == [chosen]  # one timing, no sweep
    assert r2.config == r.config

    third = r2.autotune(passes=1, reps=1, retune=True)
    assert r2.tuning["cache_hit"] is False
    assert set(third) == set(first)


def test_autotune_cache_regression_resweeps(tmp_path):
    """A cached timing far below what the config now measures triggers a
    full re-sweep instead of silently accepting a regressed config."""
    import json

    img = checker_image(32, 128, 3, seed=0)
    path = str(tmp_path / "tune.json")
    r = DeviceStreamRunner("blur3", num_images=4, image=img,
                           use_pallas=False, tune_cache_path=path)
    r.autotune(passes=1, reps=1)
    with open(path) as f:
        data = json.load(f)
    (key,) = data["entries"]
    data["entries"][key]["per_pass_s"] = 1e-12  # impossible-to-match time
    with open(path, "w") as f:
        json.dump(data, f)

    r2 = DeviceStreamRunner("blur3", num_images=4, image=img,
                            use_pallas=False, tune_cache_path=path)
    r2.autotune(passes=1, reps=1)
    assert r2.tuning["cache_hit"] is False  # re-swept

    # Distinct workloads get distinct cache keys.
    r3 = DeviceStreamRunner("blur5", num_images=4, image=img,
                            use_pallas=False, tune_cache_path=path)
    r3.autotune(passes=1, reps=1)
    with open(path) as f:
        data = json.load(f)
    assert len(data["entries"]) == 2


def test_rank_block_candidates_sized_from_live_set():
    # Wide rank windows need tiny fused blocks: the grid must be sized
    # from the live set (views * plane bytes * 1.3 <= 110 MB), largest
    # viable blocks first — the default 16..64 sweep can't reach them.
    img = checker_image(256, 256, 3, seed=3)
    r = DeviceStreamRunner("median9", num_images=8, image=img,
                           use_pallas=True)
    px = 256 * 256
    for live in (25, 49, 81):
        cands = r.rank_block_candidates(live)
        assert cands, live
        ks = [k for k, _ in cands]
        assert ks == sorted(ks, reverse=True)
        for k, mb in cands:
            assert r.n_planes % k == 0
            assert mb <= 110
            # The cap must actually hold the live set (x1.3 headroom).
            assert (live + 6) * px * 4 * k * 1.3 <= mb * 2**20 * 1.01
    # median9's 81 live views: nothing above k=3 fits at 256x256.
    assert max(k for k, _ in r.rank_block_candidates(81)) <= 3


def test_autotune_rejects_poisoned_infra_skips(monkeypatch):
    # A config skipped for an INFRA reason (compile helper 500ing, worker
    # crash-cycling) invalidates the whole sweep: the winner among the
    # survivors is not a measurement. Observed on silicon 2026-08-21:
    # XLA compiled while every pallas candidate hit HTTP 500 — the old
    # caller-side xla-only check would have persisted a 20x-slow XLA row.
    import pytest

    img = checker_image(32, 128, 3, seed=3)
    runner = DeviceStreamRunner("blur3", num_images=8, image=img,
                                use_pallas=False)
    real_build = runner._build

    def build(path="xla", **kw):
        if path != "xla":
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8103/remote_compile: "
                "HTTP 500: tpu_compile_helper subprocess exit code 1")
        return real_build(path=path, **kw)

    monkeypatch.setattr(runner, "_build", build)
    with pytest.raises(RuntimeError, match="degraded autotune sweep"):
        runner.autotune(passes=1, reps=1, cache=False,
                        candidates=[2, 4])
    # Genuine per-config rejections (VMEM OOM etc.) stay honest skips.
    def build_oom(path="xla", **kw):
        if path != "xla":
            raise RuntimeError("Mosaic: scoped vmem limit exceeded")
        return real_build(path=path, **kw)

    monkeypatch.setattr(runner, "_build", build_oom)
    timings = runner.autotune(passes=1, reps=1, cache=False,
                              candidates=[2, 4])
    assert "xla" in timings
    assert all("vmem" in v for v in runner.tuning["skipped"].values())
