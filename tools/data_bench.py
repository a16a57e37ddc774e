"""Input-pipeline throughput artifact (VERDICT r4 #7).

Measures sustained end-to-end scene throughput of the host data plane —
HDF5 read + JPEG/PNG16 decode + pad-resize-518 preprocess + certainty-
weighted correspondence sampling — for both loaders:

- the C++ dataplane (``cpp/dataplane``, N GIL-free worker threads — the
  reference's 4-DataLoader-worker equivalent, ``/root/reference/train/
  train_imc.py:503``);
- the pure-python/PIL fallback.

The number that matters: scenes/sec vs the TPU train step rate
(BENCH_r04: 2.83 steps/s at 518px, 1 scene/step/chip) — the host must
sustain >= that rate or the chip starves. The trainer additionally overlaps
loading with device steps via the prefetch thread (``train/trainer.py:
scene_stream``), so a loader matching the step rate keeps the chip fed.

Run:  python tools/data_bench.py [--seconds 20] [--out DATA_BENCH_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np


def bench_loader(root: str, use_native: bool, threads: int, seconds: float,
                 sample_num: int, num_images: int, img: int) -> dict:
    from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes

    ds = IMC2021Scenes(
        root, sample_num=sample_num, num_images=num_images, target_size=img,
        use_native=use_native, decode_threads=threads,
    )
    rng = np.random.default_rng(0)
    # warmup (first call pays h5 open + native-library init)
    ds.load_scene(0, rng)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        scene = ds.load_scene(n % len(ds), rng)
        stack_scenes([scene])  # the trainer's per-batch host work
        n += 1
    dt = time.perf_counter() - t0
    return {
        "native": bool(ds.use_native),
        "threads": threads if ds.use_native else 1,
        "scenes": n,
        "seconds": round(dt, 2),
        "scenes_per_sec": round(n / dt, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--sample-num", type=int, default=10_000)
    ap.add_argument("--num-images", type=int, default=2)
    ap.add_argument("--img-size", type=int, default=518)
    ap.add_argument("--data-root", default="",
                    help="existing scene root (default: generate synthetic "
                         "518px-class scenes)")
    ap.add_argument("--train-steps-per-sec", type=float, default=2.83,
                    help="the TPU train step rate to compare against "
                         "(BENCH_r04 518px flagship-class train)")
    ap.add_argument("--out", default=os.path.join(REPO, "DATA_BENCH_r05.json"))
    args = ap.parse_args()

    out = {
        "protocol": (
            "sustained load_scene+stack_scenes loop (HDF5 read, JPEG+PNG16 "
            "decode, pad-resize preprocess, certainty-weighted sampling of "
            f"{args.sample_num} correspondences/pair, {args.num_images} "
            f"frames/scene at {args.img_size}px) over >= {args.seconds}s per "
            "configuration; reference analogue: 4 DataLoader workers, "
            "train_imc.py:503"
        ),
        "host_cpus": os.cpu_count(),
        "train_step_rate_steps_per_sec": args.train_steps_per_sec,
        "runs": [],
    }

    ctx = None
    if args.data_root:
        root = args.data_root
    else:
        from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset

        ctx = tempfile.TemporaryDirectory()
        root = ctx.name
        # raw frames big enough that decode+resize cost matches real IMC
        # phototourism inputs at the 518 target
        make_synthetic_dataset(root, num_scenes=3, num_images=4,
                               image_size=(640, 480))
    try:
        configs = [("python", False, 1)]
        for t in (1, 2, 4):
            configs.append((f"native-{t}t", True, t))
        for tag, native, threads in configs:
            r = bench_loader(root, native, threads, args.seconds,
                             args.sample_num, args.num_images, args.img_size)
            r["tag"] = tag
            if native and not r["native"]:
                r["note"] = "native library unavailable; fell back to python"
            r["keeps_chip_fed"] = bool(
                r["scenes_per_sec"] >= args.train_steps_per_sec)
            out["runs"].append(r)
            print(f"{tag}: {r['scenes_per_sec']} scenes/s "
                  f"(fed={r['keeps_chip_fed']})", flush=True)
    finally:
        if ctx is not None:
            ctx.cleanup()

    best = max(out["runs"], key=lambda r: r["scenes_per_sec"])
    out["finding"] = (
        f"best loader ({best['tag']}) sustains {best['scenes_per_sec']} "
        f"scenes/s vs the {args.train_steps_per_sec} steps/s TPU train step "
        f"({'no starvation' if best['keeps_chip_fed'] else 'HOST-BOUND'}"
        " with the prefetch thread overlapping device steps)"
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["finding"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
