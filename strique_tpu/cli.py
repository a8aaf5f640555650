"""Command-line interface: index / count / plot / extract.

Mirrors the reference CLI surface (reference scripts/STRique.py:874-1024
and STRique_lib/fast5Index.py:248-284): same subcommands, arguments and
TSV output schema, so existing STRique workflows can switch directly.
"""
from __future__ import annotations

import argparse
import os
import sys

from .utils import logging as ulog
from .utils.config import parse_config
from .utils.logging import LogLevel, log


def cmd_index(argv) -> int:
    parser = argparse.ArgumentParser(description="Fast5 raw data archive indexing")
    parser.add_argument("input", help="Input batch or directory of batches")
    parser.add_argument("--recursive", action="store_true", help="Recursively scan input")
    parser.add_argument("--out_prefix", default="", help="Prefix for file paths in output")
    parser.add_argument("--tmp_prefix", default=None, help="Prefix for temporary data")
    args = parser.parse_args(argv)
    from .io import fast5

    for record in fast5.index(args.input, recursive=args.recursive,
                              output_prefix=args.out_prefix, tmp_prefix=args.tmp_prefix):
        print(record)
    return 0


def cmd_count(argv) -> int:
    parser = argparse.ArgumentParser(description="STR detection in raw nanopore data")
    parser.add_argument("f5Index", help="Fast5 index")
    parser.add_argument("model", help="Pore model")
    parser.add_argument("repeat", help="Repeat region config file")
    parser.add_argument("--out", default=None, help="Output file name, if not given print to stdout")
    parser.add_argument("--algn", default=None, help="Alignment in sam format, if not given read from stdin")
    parser.add_argument("--mod_model", default=None, help="Base modification pore model")
    parser.add_argument("--config", help="Config file with HMM transition probabilities")
    parser.add_argument("--t", type=int, default=1, help="Host IO worker threads (fast5 reads; also per-read mode workers)")
    parser.add_argument("--batch", type=int, default=None,
                        help="Reads per batched device invocation (1 disables batching; "
                             "default: 32 on TPU, 8 elsewhere, x data-parallel degree)")
    parser.add_argument("--devices", default="auto",
                        help="Data-parallel device count: 'auto' shards read batches over "
                             "all local accelerator devices; an integer caps it; 1 runs single-device")
    parser.add_argument("--resume", action="store_true",
                        help="Append to --out, skipping read IDs already counted")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="Write a jax.profiler trace of the run to DIR")
    parser.add_argument("--log_level", default="warning",
                        choices=["error", "warning", "info", "debug"], help="Log level")
    args = parser.parse_args(argv)
    ulog.init(log_level=args.log_level)
    config = parse_config(args.repeat, args.config)
    for path, desc in ((args.f5Index, "Fast5 index"), (args.model, "Pore model"),
                       (args.mod_model, "Modification pore model")):
        if path and not os.path.isfile(path):
            log(f"Main: {desc} file does not exist.", LogLevel.Error)
            return 1

    import jax

    from .detect.detector import RepeatDetector
    from .detect.writer import OutputWriter, processed_ids
    from .parallel.dispatcher import run_pipeline
    from .parallel.mesh import init_distributed, make_mesh

    # multi-host: each process owns its local devices and a stride of the
    # SAM stream; per-host TSV shards concatenate to the final output
    # (same unordered-collector semantics as the reference,
    # reference scripts/STRique.py:778-802)
    rank = init_distributed()
    world = jax.process_count()

    if args.devices == "auto":
        n_dev = len(jax.local_devices())
    else:
        n_dev = max(int(args.devices), 1)
        n_dev = min(n_dev, len(jax.local_devices()))
    mesh = None
    if n_dev > 1:
        mesh = make_mesh({"data": n_dev}, jax.local_devices()[:n_dev])
        log(f"Main: Sharding read batches over {n_dev} {jax.default_backend()} devices.",
            LogLevel.Info)
    batch_size = args.batch
    if batch_size is None:
        batch_size = 32 if jax.default_backend() == "tpu" else 8
    if mesh is not None and batch_size > 1:
        batch_size = (batch_size + n_dev - 1) // n_dev * n_dev

    out_path = args.out
    if world > 1 and out_path:
        out_path = f"{out_path}.part{rank}"
        log(f"Main: Process {rank}/{world}; writing shard {out_path}.", LogLevel.Info)

    rd = RepeatDetector(config["repeat"], args.model, args.f5Index,
                        mod_model_file=args.mod_model, align_config=config["align"],
                        hmm_config=config["HMM"], mesh=mesh)
    done = processed_ids(out_path) if args.resume else set()
    ow = OutputWriter(out_path, append=args.resume)
    if done:
        log(f"Main: Resuming; {len(done)} reads already counted.", LogLevel.Info)

    def sam_lines():
        stream = open(args.algn, "r") if args.algn else sys.stdin
        try:
            for i, line in enumerate(stream):
                if line.startswith("@"):
                    continue
                if world > 1 and i % world != rank:
                    continue
                if done and line.split("\t", 1)[0] in done:
                    continue
                yield line
        finally:
            if args.algn:
                stream.close()

    if args.profile:
        jax.profiler.start_trace(args.profile)
    n = run_pipeline(sam_lines(), rd, ow, io_threads=args.t, batch_size=batch_size)
    if args.profile:
        jax.profiler.stop_trace()
    log(f"Main: Processed {n} alignments.", LogLevel.Info)
    ulog.close()
    return 0


def cmd_plot(argv) -> int:
    """Signal plots over counted STR expansions (reference STRique.py:948-1024)."""
    parser = argparse.ArgumentParser(description="Signal plots over STR expansions")
    parser.add_argument("f5Index", help="Fast5 index")
    parser.add_argument("--counts", default=None, help="Count TSV from 'count', stdin if not given")
    parser.add_argument("--output", default=None, help="Output directory for plots (else GUI)")
    parser.add_argument("--format", default="png", choices={"png", "pdf", "svg"})
    parser.add_argument("--width", default=16, type=int)
    parser.add_argument("--height", default=9, type=int)
    parser.add_argument("--dpi", default=80, type=int)
    parser.add_argument("--extension", type=float, default=0.1,
                        help="Extension as fraction of repeat signal around STR region")
    parser.add_argument("--zoom", type=int, default=500, help="Region around prefix/suffix to plot")
    parser.add_argument("--log_level", default="warning",
                        choices=["error", "warning", "info", "debug"])
    args = parser.parse_args(argv)
    ulog.init(log_level=args.log_level)
    import matplotlib

    if args.output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from .io.fast5 import Fast5Index
    from .ops.signal import medfilt3

    if not os.path.isfile(args.f5Index):
        log("Main: Fast5 index file does not exist.", LogLevel.Error)
        return 1
    f5 = Fast5Index(args.f5Index)
    if args.output:
        os.makedirs(args.output, exist_ok=True)

    def tsv_iter():
        stream = open(args.counts, "r") if args.counts else sys.stdin
        try:
            for line in stream:
                if not line.startswith("ID"):
                    yield line.strip().split("\t")
        finally:
            if args.counts:
                stream.close()

    for record in tsv_iter():
        ID, target, strand, count, score_prefix, score_suffix, _, offset, ticks = record[:9]
        offset, ticks = int(offset), int(ticks)
        score_prefix, score_suffix = float(score_prefix), float(score_suffix)
        try:
            raw = f5.get_raw(ID)
        except RuntimeError:
            raw = None
        if raw is None:
            log(f"Plot: No fast5 for ID {ID}", LogLevel.Warning)
            continue
        flt = medfilt3(raw.astype(np.float64))
        flt = (flt - np.median(flt)) / np.std(flt)
        pre_ext = max(0, offset - int(ticks * args.extension))
        suf_ext = min(len(flt), offset + ticks + int(ticks * args.extension))
        pre_b = max(offset - args.zoom, 0)
        pre_e = pre_b + args.zoom * 2
        suf_b = offset + ticks - args.zoom
        suf_e = min(len(flt), suf_b + args.zoom * 2)
        plt.figure(figsize=(args.width, args.height), dpi=args.dpi, facecolor="w", edgecolor="k")
        plt.subplot(2, 1, 1)
        plt.plot(flt[pre_ext:suf_ext], "k-", linewidth=0.5, label="genome")
        plt.plot(np.arange(ticks) + (offset - pre_ext), flt[offset:offset + ticks],
                 "b-", linewidth=1.0, label="STR")
        plt.legend()
        plt.title(f"Read {ID} with {count} repeats")
        plt.subplot(2, 2, 3)
        plt.plot(flt[pre_b:pre_e], "k-", label="prefix")
        plt.plot(np.arange(args.zoom, 2 * args.zoom), flt[pre_b + args.zoom:pre_e], "b-")
        plt.axvline(args.zoom, color="red", label="STR begin")
        plt.legend()
        plt.title(f"Prefix region with score {score_prefix:.2f}")
        plt.subplot(2, 2, 4)
        plt.plot(flt[suf_b:suf_e], "k-", label="suffix")
        plt.plot(flt[suf_b:suf_e - args.zoom], "b-")
        plt.axvline(args.zoom, color="red", label="STR end")
        plt.legend()
        plt.title(f"Suffix region with score {score_suffix:.2f}")
        plt.tight_layout()
        if args.output:
            plt.savefig(os.path.join(args.output, "_".join([target, count, ID]) + "." + args.format))
            plt.close()
        else:
            plt.show()
    ulog.close()
    return 0


def cmd_extract(argv) -> int:
    parser = argparse.ArgumentParser(description="Fast5 extraction")
    parser.add_argument("batch", help="Input batch (.tar/.fast5/.txt of read IDs)")
    parser.add_argument("output", help="Output directory")
    parser.add_argument("--index", default=None, help="Read index")
    parser.add_argument("--output_format", default="single", choices=["single", "bulk", "lazy"])
    parser.add_argument("--tmp_prefix", default=None, help="Prefix for temporary data")
    args = parser.parse_args(argv)
    from .io.fast5 import Fast5Index

    Fast5Index(args.index, tmp_prefix=args.tmp_prefix).extract(
        args.batch, args.output, format=args.output_format)
    return 0


COMMANDS = {"index": cmd_index, "count": cmd_count, "plot": cmd_plot, "extract": cmd_extract}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        prog="strique",
        description="STRique-TPU: a TPU-native nanopore raw signal repeat detection pipeline",
        usage="strique <command> [<args>]\n\nCommands:\n"
              "   index      Index batch(es) of bulk-fast5 or tar archived single fast5\n"
              "   count      Count single read repeat expansions\n"
              "   plot       Plot repeat signal after counting\n"
              "   extract    Extract single reads from indexed sequencing run\n")
    parser.add_argument("command", choices=sorted(COMMANDS))
    args = parser.parse_args(argv[:1])
    return COMMANDS[args.command](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
