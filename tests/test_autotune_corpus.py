"""Autotune calibration loop and benchmark-corpus writer."""

import csv

import jax

from hipe_tpu.parallel.autotune import calibrate_ratio, sweep_batch_sizes
from hipe_tpu.profiling.corpus import write_corpus
from hipe_tpu.runtime.engine import EngineConfig
from hipe_tpu.utils.images import checker_image

IMG = checker_image(24, 32, 3, seed=0)


def _devs():
    d = jax.devices("cpu")
    return d[0], d[1]


def test_calibrate_ratio_converges_or_stops():
    # Structural smoke on the REAL engine only. Any assertion that compares
    # measured imbalances across iterations is inherently flaky here: the
    # two "identical" virtual lanes share physical cores, so the measured
    # imbalance is pure host-load noise (1.5x, 2.5x per-step bounds and a
    # best-later-iteration bound all tripped under a loaded host). The
    # feedback logic itself is pinned deterministically below with an
    # injected measurement model.
    cpu, accel = _devs()
    base = EngineConfig(approach=1, mode="both", batch_size=16, num_images=64)
    res = calibrate_ratio(base, IMG, max_iters=3, tol_pct=5.0,
                          cpu_device=cpu, accel_device=accel)
    assert 0.0 <= res.ratio <= 1.0
    assert 1 <= len(res.history) <= 3
    # The returned ratio/stats pair is the best-imbalance iteration.
    best_imb = min(imb for _, imb in res.history)
    assert any(r == res.ratio and imb == best_imb for r, imb in res.history)


def test_calibrate_ratio_feedback_logic(monkeypatch):
    """Deterministic convergence: inject a noise-free measurement model.

    Fake lanes cost a=3 ms/img (cpu) and b=1 ms/img (accel). The fixed
    point of ratio* = Tc/(Tc+Tg) on per-unit times is a/(a+b) = 0.75:
    one measured step from 0.5 must land there and the loop must then
    stop on the imbalance tolerance, keeping the balanced iteration.
    """
    import hipe_tpu.parallel.autotune as at
    from hipe_tpu.profiling.events import RunStats

    A_MS, B_MS = 3.0, 1.0

    class FakeEngine:
        def __init__(self, cfg, cpu_device=None, accel_device=None):
            self.cfg = cfg

        def run(self, image=None):
            cfg = self.cfg
            n = cfg.num_images
            n_gpu = int(round(cfg.gpu_ratio * n))
            n_cpu = n - n_gpu
            s = RunStats(
                approach=cfg.approach, mode=cfg.mode,
                gpu_ratio=cfg.gpu_ratio, batch_size=cfg.batch_size,
                num_images=n, num_batches=1,
                width=image.shape[1], height=image.shape[0],
                channels=image.shape[2], pipeline="blur",
            )
            s.cpu.units = s.cpu.images = n_cpu
            s.cpu.kernel_ms = n_cpu * A_MS
            s.accel.units = s.accel.images = n_gpu
            s.accel.kernel_ms = n_gpu * B_MS
            s.wall_ms = max(s.cpu.kernel_ms, s.accel.kernel_ms)
            return s

    monkeypatch.setattr(at, "Engine", FakeEngine)
    base = EngineConfig(approach=1, mode="both", batch_size=16,
                        num_images=64)
    res = at.calibrate_ratio(base, IMG, start_ratio=0.5, max_iters=4,
                             tol_pct=2.0)
    # One feedback step reaches the analytic fixed point and stops there.
    assert len(res.history) == 2
    assert res.history[0][0] == 0.5
    assert res.history[1][0] == A_MS / (A_MS + B_MS)
    assert res.history[1][1] <= 2.0  # converged under tol
    assert res.ratio == A_MS / (A_MS + B_MS)
    # And the loop must not stop before converging: iteration 0's
    # imbalance at 50/50 with a 3x-speed accel is large.
    assert res.history[0][1] > 2.0


def test_sweep_and_corpus(tmp_path):
    cpu, accel = _devs()
    base = EngineConfig(approach=1, mode="both", gpu_ratio=0.5,
                        batch_size=16, num_images=32)
    stats = sweep_batch_sizes(base, IMG, batch_sizes=(8, 16), runs=2,
                              cpu_device=cpu, accel_device=accel)
    assert len(stats) == 4
    per_run, avg = write_corpus(stats, str(tmp_path / "corpus"))
    with open(per_run) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert {r["batch_size_file"] for r in rows} == {"8", "16"}
    with open(avg) as f:
        avg_rows = list(csv.DictReader(f))
    assert len(avg_rows) == 2
    assert all(r["runs"] == "2" for r in avg_rows)
    # per-run report logs exist
    assert (tmp_path / "corpus" / "8_run_1.txt").exists()
    assert (tmp_path / "corpus" / "16_run_2.txt").exists()


def test_full_tune_picks_ratio_and_batch():
    from hipe_tpu.parallel.autotune import tune

    cpu, accel = _devs()
    base = EngineConfig(approach=1, mode="both", num_images=64)
    res = tune(base, IMG, batch_sizes=(16, 32), calib_images=32,
               cpu_device=cpu, accel_device=accel)
    assert res.batch_size in (16, 32)
    assert 0.0 <= res.ratio <= 1.0
    assert res.stats.images_per_sec > 0
