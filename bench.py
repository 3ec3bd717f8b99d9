"""Flagship benchmark: img/s per chip on the 5000-image 256x256 blur stream.

The reference's headline metric is whole-stream throughput of a 3x3 Gaussian
blur over a simulated 5000-image stream (`/root/reference/README.md:71-85`,
best: 8568 img/s on i7-12700 + UHD770). The TPU-native equivalent measured
here: the decoded 256x256 RGB image is replicated into a device-resident
5000-image stream (the reference's host-side memcpy stream simulation,
`heterogeneous_blur.c:431-442`, moved to HBM where a TPU serving pipeline
would stage its inputs), and the Pallas blur kernel processes the whole
stream; every pass reads and writes 983 MB of distinct HBM buffers.

Timing uses pass-count differencing — time(warm, K+1 passes) - time(warm, 1
pass) — so the fixed host<->device dispatch/sync latency (which is an
artifact of the test harness tunnel, ~30 ms, and would hide the kernel
entirely at these speeds) cancels out; the quotient is steady-state
per-pass throughput. Chained passes feed each output into the next pass's
input, so XLA cannot hoist or elide any work.

Prints ONE JSON line:
  {"metric": ..., "value": img_per_s, "unit": "img/s", "vs_baseline": ...}
vs_baseline is relative to the north-star target of 50,000 img/s/chip
(BASELINE.json); the reference's own best (8568 img/s) is included in the
payload for context. Correctness (max-abs pixel error vs the OpenCL-semantics
oracle; target <=1) is verified in the same run.
"""

from __future__ import annotations

import json
import sys
import time


NORTH_STAR_IMG_S = 50_000.0
REFERENCE_BEST_IMG_S = 8568.1  # README.md:74 / data/approach1/35_run_1.txt
NUM_IMAGES = 5000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def tunnel_alive(timeout_s: int = 120) -> bool:
    """Probe the default backend in a subprocess with a hard timeout.

    The axon tunnel can go down for hours (CLAUDE.md), in which case
    jax.devices() hangs indefinitely — a driver calling bench.py would
    hang with it. The probe subprocess is killable; the parent is not
    once the backend starts initializing.
    """
    import subprocess

    probe = ("import jax, numpy as np, jax.numpy as jnp; "
             "print('OK', int(np.asarray(jnp.arange(4)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=timeout_s)
        return b"OK 6" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def backend_healthy(timeout_s: int = 420) -> bool:
    """Execute a real chained Pallas program in a subprocess.

    The arange probe passes while the TPU worker is CRASH-CYCLING after
    an OOM (observed 2026-08-19): real programs then fail with
    FAILED_PRECONDITION / "worker process crashed" for 10+ minutes.
    Only an actual kernel execution proves the chip is measurable.

    The execution alone is still not enough (observed 2026-08-21): with
    the persisted compilation cache warm, a chained-kernel run succeeds
    while the REMOTE COMPILE HELPER is 500ing every fresh compile — a
    sweep started then skips all pallas candidates as poisoned and burns
    a campaign attempt. So the probe also compiles one tiny
    NEVER-CACHED program (a unique constant baked per call) to prove
    the compile path end-to-end.
    """
    import subprocess

    nonce = int(time.time() * 1000) % 100_000_000
    probe = f"""
from hipe_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from hipe_tpu.io_.jpeg import decode_file
from hipe_tpu.utils.images import DEFAULT_IMAGE_256
from hipe_tpu.runtime.device_stream import DeviceStreamRunner
r = DeviceStreamRunner('blur3', num_images=60,
                       image=decode_file(DEFAULT_IMAGE_256))
r._sync(r._chained(r.stream, 3))
import jax, jax.numpy as jnp, numpy as np
if jax.default_backend() != 'cpu':
    from jax.experimental import pallas as pl

    def _k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.int32({nonce})

    out = pl.pallas_call(
        _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
    )(jnp.zeros((8, 128), jnp.int32))
    assert int(np.asarray(out)[0, 0]) == {nonce}
print('OKHEALTH')
"""
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=timeout_s)
        return b"OKHEALTH" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    # Fail fast (with bounded retries) on a dead tunnel instead of hanging
    # in backend init; emit the one-line JSON contract either way so the
    # driver records a diagnosable failure, not a timeout.
    import time

    attempts = 5
    for attempt in range(attempts):
        if tunnel_alive():
            # Tunnel answers; now demand a real kernel execution — the
            # arange probe passes while the worker is crash-cycling.
            if backend_healthy():
                break
            log(f"tunnel up but worker unhealthy "
                f"({attempt + 1}/{attempts}); the post-crash cycle takes "
                "~10 min")
        else:
            log(f"TPU tunnel probe {attempt + 1}/{attempts} failed"
                + ("; retrying in 120 s" if attempt + 1 < attempts else ""))
        if attempt + 1 < attempts:
            time.sleep(120)
    else:
        print(json.dumps({
            "metric": "img_per_s_per_chip",
            "value": None,
            "unit": "img/s",
            "vs_baseline": None,
            "error": "tpu backend unreachable or unhealthy (probe/health "
                     f"gate failed {attempts}x); rerun when a real kernel "
                     "executes",
        }))
        return 2

    import jax
    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.runtime.device_stream import DeviceStreamRunner
    from hipe_tpu.utils.images import DEFAULT_IMAGE_256

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    num_images = NUM_IMAGES if on_tpu else 64  # tiny smoke run off-TPU
    log(f"backend={backend} devices={jax.devices()} num_images={num_images}")

    img = decode_file(DEFAULT_IMAGE_256)
    try:
        return _measure(img, num_images, on_tpu, backend)
    except Exception as e:  # noqa: BLE001 — keep the one-line JSON
        # contract even when the worker crashes mid-measurement, so the
        # driver records a diagnosable failure instead of a traceback.
        print(json.dumps({
            "metric": "img_per_s_per_chip",
            "value": None,
            "unit": "img/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        return 2


def _measure(img, num_images: int, on_tpu: bool, backend: str) -> int:
    from hipe_tpu.runtime.device_stream import DeviceStreamRunner

    runner = DeviceStreamRunner(
        "blur3", num_images=num_images, image=img, use_pallas=on_tpu
    )

    # Measured fastest-path selection (XLA vs Pallas vs aliased Pallas over
    # a block sweep) — the calibration-loop analog, never assumed. The
    # winner persists in .jax_cache/autotune.json; a cached config is
    # re-verified with one timing and the 13-config sweep only re-runs on
    # regression or --retune.
    timings = runner.autotune(
        passes=4 if on_tpu else 1, reps=2, retune="--retune" in sys.argv
    )
    for label, t in sorted(timings.items(), key=lambda kv: kv[1]):
        log(f"  autotune {label:22s} {t * 1e3:8.2f} ms/pass")
    cache_hit = bool(runner.tuning.get("cache_hit"))
    skipped = runner.tuning.get("skipped") or {}
    log(
        f"chosen config: {runner.tuning['chosen']}"
        + (" (cache hit, sweep skipped)" if cache_hit else "")
    )
    for label, exc in skipped.items():
        log(f"  autotune skipped {label}: {exc}")

    max_abs_err = runner.verify_max_abs_err()
    log(f"max_abs_err vs oracle: {max_abs_err}")

    # Repeated measurement sessions: report the median (headline), keep the
    # spread (shared-chip variance on this setup is real; the reference
    # likewise committed 3 runs per config).
    sessions = []
    for i in range(3):
        res = runner.measure_throughput(passes=10 if on_tpu else 2, reps=3)
        sessions.append(res)
        log(
            f"session {i}: per-pass {res['per_pass_s'] * 1e3:.2f} ms -> "
            f"{res['img_per_s']:,.0f} img/s "
            f"(~{res['hbm_gb_per_s']:.0f} GB/s HBM)"
        )
    rates = sorted(r["img_per_s"] for r in sessions)
    img_per_s = rates[len(rates) // 2]  # median of 3

    result = {
        "metric": "img_per_s_per_chip_5000x256x256_blur3_stream",
        "value": round(img_per_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / NORTH_STAR_IMG_S, 3),
        "baseline_img_s": NORTH_STAR_IMG_S,
        "reference_best_img_s": REFERENCE_BEST_IMG_S,
        "vs_reference": round(img_per_s / REFERENCE_BEST_IMG_S, 1),
        "max_abs_err": max_abs_err,
        "max_abs_err_target": 1,
        "backend": backend,
        "num_images": num_images,
        "sessions_img_s": [round(r, 1) for r in rates],
        "img_s_min": round(rates[0], 1),
        "img_s_max": round(rates[-1], 1),
        "chosen_config": runner.tuning["chosen"],
        "autotune_cache_hit": cache_hit,
        "autotune_skipped": skipped,
        "autotune_ms_per_pass": {
            k: round(v * 1e3, 3) for k, v in timings.items()
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
