"""Probe: host entropy-coding throughput — Python fan-out vs native batch.

Round 2 measured the serving path gated on host entropy stages (3.3-9k
img/s feeding a 25-113k img/s device transcode). This probe measures, on
this host, the old path (per-image ctypes calls fanned over a Python
ThreadPoolExecutor — GIL-bound between calls) against the round-3 native
batch calls (hipe_jpeg_read_coefs_batch / write_coefs_batch: one ctypes
call, pthread work queue, zero GIL involvement).

Writes benchmarks/probe_entropy.json. Host-only: no TPU needed; run
anywhere, but the committed numbers come from the bench host.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipe_tpu.io_ import jpeg as jio
from hipe_tpu.utils.images import DEFAULT_IMAGE_256


def _payloads(n: int) -> list[bytes]:
    img = jio.decode_file(DEFAULT_IMAGE_256)
    data = jio.encode_bytes_opts(img, quality=90, subsampling="420")
    return [data] * n


def _time(fn, *, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ncpu = os.cpu_count() or 1
    results = {"cpu_count": ncpu, "image": "256x256 q90 420", "cases": {}}
    for n in (100, 500):
        payloads = _payloads(n)
        cos = jio.read_coefficients_batch(payloads)
        stacked = [
            np.stack([co.components[ci].coefs for co in cos])
            for ci in range(3)
        ]
        pool4 = ThreadPoolExecutor(max_workers=4)  # round-2 hardcoded size
        pool = ThreadPoolExecutor(max_workers=ncpu)

        case = {}
        # -- entropy decode --
        t = _time(lambda: list(pool4.map(jio.read_coefficients, payloads)))
        case["read_pool4_img_s"] = round(n / t, 1)
        t = _time(lambda: list(pool.map(jio.read_coefficients, payloads)))
        case["read_pool_ncpu_img_s"] = round(n / t, 1)
        t = _time(lambda: jio.read_coefficients_batch(payloads))
        case["read_batch_img_s"] = round(n / t, 1)

        # -- entropy encode --
        def write_one(i):
            return jio.write_coefficients(
                [comp[i] for comp in stacked], 256, 256, quality=90,
                subsampling="420",
            )

        t = _time(lambda: list(pool4.map(write_one, range(n))))
        case["write_pool4_img_s"] = round(n / t, 1)
        t = _time(lambda: list(pool.map(write_one, range(n))))
        case["write_pool_ncpu_img_s"] = round(n / t, 1)
        t = _time(
            lambda: jio.write_coefficients_batch(
                stacked, 256, 256, quality=90, subsampling="420"
            )
        )
        case["write_batch_img_s"] = round(n / t, 1)

        case["read_speedup_vs_pool4"] = round(
            case["read_batch_img_s"] / case["read_pool4_img_s"], 2
        )
        case["write_speedup_vs_pool4"] = round(
            case["write_batch_img_s"] / case["write_pool4_img_s"], 2
        )
        results["cases"][f"batch_{n}"] = case
        pool4.shutdown()
        pool.shutdown()
        print(f"batch {n}: {json.dumps(case)}")

    out = os.path.join(os.path.dirname(__file__), "probe_entropy.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
