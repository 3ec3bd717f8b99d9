"""Full-scale FleetEngine run on the real CPU+TPU pair.

Exercises the N-lane fleet executor (`hipe_tpu.runtime.fleet`) on real
heterogeneous hardware — the host CPU backend + the TPU chip, exactly the
device pairing the two-lane Engine uses for reference parity — and commits
its per_run.csv-schema row plus the lane report, so the fleet path has a
measured full-scale artifact like the Engine's full_scale/ logs.

Usage: python benchmarks/run_fleet.py [--num-images N] [--batch B]
           [--weights WCPU WTPU] [--out benchmarks/full_scale]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-images", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--approach", type=int, default=1, choices=(1, 2))
    ap.add_argument("--weights", type=float, nargs=2, default=None,
                    metavar=("WCPU", "WTPU"),
                    help="lane weights; default: calibrate with a short run")
    ap.add_argument("--image", default="/root/reference/image_320x240.jpg")
    ap.add_argument("--out", default="benchmarks/full_scale")
    ap.add_argument("--scheduler", default="static",
                    choices=("static", "greedy"),
                    help="greedy = N-lane batch-level work stealing "
                    "(no weights/calibration needed)")
    ap.add_argument("--elastic", action="store_true",
                    help="greedy only: survive a lane failure mid-run")
    args = ap.parse_args()

    import jax

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.parallel import mesh as meshlib
    from hipe_tpu.runtime.fleet import FleetEngine, LaneSpec
    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    inv = meshlib.discover()
    cpu = meshlib.require_device(inv, "cpu")
    accel = meshlib.require_device(inv, "accel")
    print(f"lanes: cpu={cpu.device_kind}, accel={accel.device_kind}",
          file=sys.stderr)

    image = np.ascontiguousarray(decode_file(args.image))

    weights = args.weights
    if args.scheduler == "greedy" and weights is None:
        # Greedy self-balances: no calibration run needed (its whole point).
        weights = [1.0, 1.0]
    if weights is None:
        # Measured-feedback calibration, fleet form: short run at equal
        # weights, then weights_i ∝ 1/t_i (README.md:87-93 generalized).
        calib = FleetEngine(
            [LaneSpec(cpu, 1.0, "cpu"), LaneSpec(accel, 1.0, "tpu")],
            approach=args.approach, batch_size=args.batch,
            num_images=min(args.num_images, 300),
        )
        calib.run(image=image)
        weights = calib.stats.recommended_weights()
        print(f"calibrated weights: {[round(w, 3) for w in weights]}",
              file=sys.stderr)

    eng = FleetEngine(
        [LaneSpec(cpu, weights[0], "cpu"), LaneSpec(accel, weights[1], "tpu")],
        approach=args.approach, batch_size=args.batch,
        num_images=args.num_images,
        scheduler=args.scheduler, elastic=args.elastic,
    )
    stats = eng.run(image=image)
    report = eng.report()
    print(report)

    os.makedirs(args.out, exist_ok=True)
    tag = "_greedy" if args.scheduler == "greedy" else ""
    log_path = os.path.join(
        args.out, f"fleet{tag}_a{args.approach}_{args.num_images}_run.txt"
    )
    with open(log_path, "w") as f:
        f.write(f"scheduler: {args.scheduler}\n")
        f.write(f"weights: {[round(w, 4) for w in weights]}\n")
        f.write(report + "\n")
    row = eng.to_csv_row(run=1, file=os.path.basename(log_path))
    csv_path = os.path.join(args.out, "fleet_runs.csv")
    from hipe_tpu.profiling.report import CSV_COLUMNS

    write_header = not os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
        if write_header:
            w.writeheader()
        w.writerow(row)
    print(f"wrote {log_path} and {csv_path}", file=sys.stderr)
    print(f"fleet throughput: {stats.images_per_sec:.1f} img/s, "
          f"imbalance {stats.imbalance_pct():.1f}%", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
