"""Measure per-read HOST costs and project the multi-chip feed ceiling.

The mesh path replicates per-chip device work, so scaling to N chips is
host-bound: the host must prep, upload, decode and write N x the reads.
This measures each host stage in core-milliseconds per read on the bench
workload and projects the sustainable feed rate against 1/2/4/8 chips.

Usage: python tools/profile_host.py          (any backend; prep/decode
       timings are pure host work — device dispatch is excluded)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"


def main():
    from bench import PREFIX, SUFFIX
    from strique_tpu import native as native_lib
    from strique_tpu.detect.counter import (RepeatCounter, _buf_bytes,
                                            signal_bucket)
    from strique_tpu.ops.prep import model_const
    from strique_tpu.ops import viterbi as viterbi_ops
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL_FILE)
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
    tc = counter.targets["c9orf72"][0]

    rng = np.random.default_rng(7)
    backbone = "".join(rng.choice(list("ACTG"), 2000))
    seq = backbone[:1000] + PREFIX + "GGCCCC" * 100 + SUFFIX + backbone[-1000:]
    reads = [pm.generate_signal(seq, samples=8, noise=True, rng=rng)
             for _ in range(16)]
    n = len(reads[0])
    npad = signal_bucket(n)
    cores = os.cpu_count() or 1
    print(f"host: {cores} cores; read length {n} (bucket {npad})")

    # -- stage 1: preprocessing (native single pass, 1 thread) -------------
    assert native_lib.available(), "native library must build for this profile"
    mc = model_const(pm)
    buf = np.zeros((len(reads), _buf_bytes(npad)), np.uint8)

    def prep_one(i):
        row = buf[i]
        raw = np.asarray(reads[i], np.float64)
        flt32 = row[: 4 * npad].view(np.float32)[: len(raw)]
        lut = row[4 * npad : 4 * npad + 1024].view(np.float32)
        q = row[4 * npad + 1024 :][: len(raw)]
        return native_lib.preprocess_read_lut(raw, mc, flt32, q, lut)

    for i in range(len(reads)):
        prep_one(i)  # warm caches
    t0 = time.perf_counter()
    flts = [prep_one(i) for i in range(len(reads))]
    prep_ms = (time.perf_counter() - t0) / len(reads) * 1e3

    # -- stage 2: result decode (host side of detect_middle/finish) ---------
    # run one real batch to obtain device results, then time pure decode
    # with every transfer pre-materialized
    state = counter.detect_submit("c9orf72", reads, "+")
    outs = counter.detect_finish(state)
    chm = tc.repeat_hmm
    if state.get("split"):
        from strique_tpu.detect.packed import unpack_meta

        meta_np = np.asarray(state["bounds_dev"])[: len(reads)]
        # detect_middle only sets 'vit' when at least one read passed the
        # QC gate; an all-gated-out run still profiles the meta decode
        mat = (counter._viterbi_collect(state["vit"])
               if state.get("vit") is not None else np.zeros((0, 1), np.int32))

        def decode_all():
            rows = unpack_meta(meta_np)
            acc = 0.0
            k = 0
            for i, r in enumerate(rows):
                if not r.ok:
                    continue
                seg = flts[i][r.prefix_begin : r.suffix_end]
                cnt = viterbi_ops.count_repeats(mat[k], r.seg_len, chm)
                acc += viterbi_ops.path_logp_f64(seg, mat[k], chm) + cnt
                k += 1
            return acc
    else:
        from strique_tpu.detect.packed import unpack_results

        fused = state["fused"]
        if hasattr(fused, "result"):
            fused = fused.result()
        packed_np = np.asarray(fused)

        def decode_all():
            rows = unpack_results(packed_np[: len(reads)], chm.n_states)
            acc = 0.0
            for i, r in enumerate(rows):
                if not r.ok:
                    continue
                seg = flts[i][r.prefix_begin : r.suffix_end]
                cnt = viterbi_ops.count_repeats(r.path, r.seg_len, chm)
                acc += viterbi_ops.path_logp_f64(seg, r.path, chm) + cnt
            return acc

    decode_all()
    t0 = time.perf_counter()
    decode_all()
    decode_ms = (time.perf_counter() - t0) / len(reads) * 1e3

    # -- stage 3: upload-buffer assembly is inside prep (single pass); the
    # remaining per-read host work is queue/writer plumbing — measure the
    # writer row format as a proxy
    t0 = time.perf_counter()
    for i, o in enumerate(outs):
        _ = "\t".join(str(x) for x in (f"id{i}", "c9orf72", "+", *o))
    write_ms = (time.perf_counter() - t0) / len(reads) * 1e3

    total_core_ms = prep_ms + decode_ms + write_ms
    host_rps = cores / total_core_ms * 1e3
    print(f"prep   {prep_ms:7.2f} core-ms/read")
    print(f"decode {decode_ms:7.2f} core-ms/read")
    print(f"write  {write_ms:7.3f} core-ms/read")
    print(f"total  {total_core_ms:7.2f} core-ms/read "
          f"-> host ceiling ~{host_rps:.0f} reads/s on {cores} cores")
    chip_rps = float(os.environ.get("CHIP_READS_PER_SEC", "214"))
    for chips in (1, 2, 4, 8):
        need = chip_rps * chips
        print(f"{chips} chip(s): need {need:6.0f} reads/s -> "
              f"{'host-bound' if need > host_rps else 'device-bound'} "
              f"(host/need = {host_rps / need:.2f}; "
              f"cores needed ~{need * total_core_ms / 1e3:.1f})")


if __name__ == "__main__":
    main()
