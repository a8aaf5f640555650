"""Multi-device scaling-efficiency benchmark (BASELINE.md north star:
>= 80% reads/s scaling efficiency across the mesh).

Sweeps the data-parallel degree over {1, 2, 4, ...} devices, running the
production fused detection pipeline (`RepeatCounter` with a data-only
``jax.sharding.Mesh``) on a synthetic c9orf72 workload, and reports
reads/s plus efficiency per point.

On a host without multiple accelerators this runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``): the harness then validates
the sharded execution path and its overheads, while the *parallel*
efficiency ceiling is min(n_devices, physical cores) — ideal throughput
is computed against that ceiling so the number stays meaningful on both
a 2-core CI host and an 8-chip TPU host.

Prints one JSON line per sweep point and writes the full sweep to
SCALING.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")
SUFFIX = ("TAGCGCGCGACTCCTGAGTTCCAGAGCTTGCTACAGGCTGCGGTTGTTTCCCTCCTTGTTTTCTTCTGGTTAA"
          "TCTTTATCAGGTCTTTTCTTGTTCACCCTCAGCGAGTACTGTGAGAGCAAGTAGTGGGGAGAGAGGGTGGGAAAAAC")


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default=None,
                    help="Comma-separated sweep points (default: powers of 2 up to all devices)")
    ap.add_argument("--per-device", type=int, default=int(os.environ.get("SCALE_PER_DEV", "8")),
                    help="Reads per device per batch")
    ap.add_argument("--batches", type=int, default=int(os.environ.get("SCALE_BATCHES", "3")),
                    help="Timed batches per sweep point")
    ap.add_argument("--repeats", type=int, default=20, help="Repeat units per synthetic read")
    ap.add_argument("--out", default="SCALING.json")
    return ap.parse_args()


def main():
    args = parse_args()
    force_cpu = os.environ.get("JAX_PLATFORMS", "") in ("", "axon")
    if force_cpu:
        # no multi-chip hardware behind the tunnel: use the virtual CPU
        # mesh (XLA_FLAGS takes effect because backends init lazily; the
        # platform itself must go through jax.config — the axon
        # sitecustomize imports jax at interpreter startup)
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))

    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.parallel.mesh import make_mesh
    from strique_tpu.pore_model import PoreModel

    all_devices = jax.devices()
    cores = os.cpu_count() or 1
    if args.devices:
        sweep = [int(x) for x in args.devices.split(",")]
    else:
        sweep = []
        n = 1
        while n <= len(all_devices):
            sweep.append(n)
            n *= 2

    pm = PoreModel(MODEL_FILE)
    rng = np.random.default_rng(99)
    backbone = "".join(rng.choice(list("ACTG"), 1000))
    seq = backbone[:500] + PREFIX + "GGCCCC" * args.repeats + SUFFIX + backbone[-500:]
    max_batch = args.per_device * max(sweep)
    sigs = [pm.generate_signal(seq, samples=6, noise=True, rng=rng)
            for _ in range(max_batch)]
    n_len = max(len(s) for s in sigs)
    sigs = [np.pad(s, (0, n_len - len(s)), mode="edge") for s in sigs]

    points = []
    rps1 = None
    for n_dev in sweep:
        mesh = None
        if n_dev > 1:
            mesh = make_mesh({"data": n_dev}, all_devices[:n_dev])
        counter = RepeatCounter(MODEL_FILE, mesh=mesh)
        counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
        B = args.per_device * n_dev
        batch = sigs[:B]
        counter.detect_many("c9orf72", batch, "+")  # compile + warm
        t0 = time.perf_counter()
        ok = 0
        for _ in range(args.batches):
            for res in counter.detect_many("c9orf72", batch, "+"):
                ok += int(res[0] == args.repeats)
        dt = time.perf_counter() - t0
        rps = args.batches * B / dt
        if rps1 is None:
            rps1 = rps
        ceiling = min(n_dev, cores) if jax.default_backend() == "cpu" else n_dev
        point = {
            "metric": "scaling_reads_per_sec",
            "devices": n_dev,
            "value": round(rps, 3),
            "unit": "reads/s",
            "efficiency_vs_linear": round(rps / (rps1 * n_dev), 4),
            "efficiency_vs_host_ceiling": round(rps / (rps1 * ceiling), 4),
            "accuracy": f"{ok}/{args.batches * B}",
            "backend": jax.default_backend(),
            "physical_cores": cores,
        }
        points.append(point)
        print(json.dumps(point), flush=True)

    with open(args.out, "w") as fp:
        json.dump({"sweep": points}, fp, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
