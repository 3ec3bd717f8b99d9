"""Probe: lossless DCT-domain transform throughput (the jpegtran analog).

Measures transform_batch (GIL-free native entropy ends + one jitted
tensor op per geometry group) against the per-image transform_bytes
loop, and breaks the batch path into its stages so the report shows
where the time goes (expected: the host entropy ends dominate — the
tensor op itself is a trivial device program).

Writes benchmarks/probe_transform.json. Stage split and the device op
rate are backend-dependent (run on the TPU bench host for the committed
numbers); the entropy ends are host-only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from hipe_tpu.io_ import jpeg as jio
from hipe_tpu.ops import jpeg_transform as jt
from hipe_tpu.utils.images import DEFAULT_IMAGE_256


def _time(fn, *, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    img = jio.decode_file(DEFAULT_IMAGE_256)
    data = jio.encode_bytes_opts(img, quality=90, subsampling="420")
    results = {"image": "256x256 q90 420", "cpu_count": os.cpu_count(),
               "cases": {}}
    for n in (100, 500):
        payloads = [data] * n
        case = {}
        for op in ("rot90", "flip_h"):
            t = _time(lambda: jt.transform_batch(payloads, op))
            case[f"batch_{op}_img_s"] = round(n / t, 1)
        t = _time(lambda: [jt.transform_bytes(p, "rot90")
                           for p in payloads])
        case["single_rot90_img_s"] = round(n / t, 1)
        # Stage split of the batch path.
        t = _time(lambda: jio.read_coefficients_batch(payloads))
        case["stage_read_img_s"] = round(n / t, 1)
        cos = jio.read_coefficients_batch(payloads)
        stacked = [np.stack([co.components[ci].coefs for co in cos])
                   for ci in range(3)]
        dev = [jnp.asarray(s) for s in stacked]

        def _op_only():
            outs = [np.asarray(jt._jitted("rot90")(d)) for d in dev]
            return outs

        _op_only()  # compile outside the clock
        t = _time(_op_only)
        case["stage_tensor_op_img_s"] = round(n / t, 1)
        tr = [np.ascontiguousarray(o) for o in _op_only()]
        q = [np.asarray(c.qtable, np.uint16).reshape(8, 8).T.reshape(64)
             for c in cos[0].components]
        t = _time(lambda: jio.write_coefficients_batch(
            tr, cos[0].height, cos[0].width, subsampling="420", qtables=q))
        case["stage_write_img_s"] = round(n / t, 1)
        results["cases"][f"n{n}"] = case
        print(f"n={n}: {case}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_transform.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
