"""qfspark command line (mirrors the reference CLI, cmd/main.go:22-143).

  python -m qfspark.cli build    <out.qf> --input lines.txt|table.parquet
                                 [--column url] [--counter-bits N]
                                 [--hash murmur64a] [--bit-packed]
                                 [--expected-entries N] [--spark]
  python -m qfspark.cli lookup   <filter.qf> <key> [...]
  python -m qfspark.cli describe <filter.qf>

``build`` reads newline-delimited text (the reference's only source,
cmd/main.go:52-77) or a parquet column; with ``--spark`` the build runs
through the distributed pipeline, otherwise locally in numpy.
``lookup`` opens the filter read-only (memory-mapped, zero-load) and
probes each key. ``describe`` prints the header + sizing report.
"""

from __future__ import annotations

import argparse
import sys

from .disk import open_any, read_header_from_path, save
from .kernel import QF
from .sizing import QFConfig


def _build_config(args) -> QFConfig:
    return QFConfig(
        counter_bits=args.counter_bits,
        bit_packed=args.bit_packed,
        expected_entries=args.expected_entries,
        hash_name=args.hash,
    )


def cmd_build(args) -> int:
    cfg = _build_config(args)
    if args.input.endswith(".parquet") or args.spark:
        from pyspark.sql import SparkSession

        from .build import build_qf

        spark = (
            SparkSession.builder.master(args.master)
            .appName("qfspark-build")
            .getOrCreate()
        )
        if args.input.endswith(".parquet"):
            df = spark.read.parquet(args.input)
            col = args.column or df.columns[0]
        else:
            df = spark.read.text(args.input).withColumnRenamed("value", "key")
            col = "key"
        qf = build_qf(df, col, config=cfg)
        spark.stop()
    else:
        with open(args.input, "r", encoding="utf-8") as f:
            keys = [line.rstrip("\n") for line in f if line.strip()]
        qf = QF.from_keys(keys, config=cfg)
    if args.gqf:
        from .serde import qf_to_gqf_bytes

        payload = qf_to_gqf_bytes(qf)
        with open(args.out, "wb") as f:
            f.write(payload)
        n = len(payload)
    else:
        n = save(qf, args.out)
    print(f"wrote {args.out}: {len(qf)} entries, q_bits={qf.q_bits}, {n} bytes")
    return 0


def cmd_lookup(args) -> int:
    try:
        qf = open_any(args.filter, hash_name=args.hash)
    except FileNotFoundError:
        print(f"error: no such filter file: {args.filter}", file=sys.stderr)
        return 2
    found, counts = qf.lookup_keys(args.keys)
    status = 0
    for key, f, c in zip(args.keys, found.tolist(), counts.tolist()):
        if f:
            if qf.config.counter_bits:
                print(f"{key}: present (count={c})")
            else:
                print(f"{key}: present")
        else:
            print(f"{key}: not present")
            status = 1
    return status


def cmd_merge(args) -> int:
    """Merge any number of filter files into one (associative lossless
    merge; counters add). Inputs may be native or go-qfext format."""
    filters = [open_any(p, hash_name=args.hash) for p in args.inputs]
    merged = QF.merge_many(filters)
    n = save(merged, args.out)
    print(
        f"wrote {args.out}: {len(merged)} entries from {len(filters)} filters, "
        f"q_bits={merged.q_bits}, {n} bytes"
    )
    return 0


def cmd_describe(args) -> int:
    try:
        h = read_header_from_path(args.filter)
    except ValueError:
        # go-qfext wire format: describe via full load
        qf = open_any(args.filter, hash_name=args.hash)
        h = {
            "format": "go-qfext",
            "version": 4,
            "bit_packed": qf.config.bit_packed,
            "q_bits": qf.q_bits,
            "r_bits": qf.r_bits,
            "counter_bits": qf.config.counter_bits,
            "entries": qf.entries,
            "hash_name": f"{args.hash} (assumed; gqf format carries none)",
        }
    for k, v in h.items():
        print(f"{k:14s} {v}")
    cfg = QFConfig(
        counter_bits=h["counter_bits"], bit_packed=h["bit_packed"],
        q_bits=h["q_bits"], hash_name=h["hash_name"],
        expected_entries=h["entries"],
    )
    print(cfg.explain())
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qfspark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a filter from text lines or parquet")
    b.add_argument("out")
    b.add_argument("--input", required=True)
    b.add_argument("--column", default=None)
    b.add_argument("--counter-bits", type=int, default=0)
    b.add_argument("--hash", default="murmur64a",
                   choices=["murmur64a", "xxhash64", "fnv1a"])
    b.add_argument("--bit-packed", action="store_true")
    b.add_argument("--expected-entries", type=int, default=0)
    b.add_argument("--spark", action="store_true")
    b.add_argument("--master", default="local[*]")
    b.add_argument("--gqf", action="store_true",
                   help="write the go-qfext wire format instead of native")
    b.set_defaults(fn=cmd_build)

    lk = sub.add_parser("lookup", help="probe keys against a filter file")
    lk.add_argument("filter")
    lk.add_argument("keys", nargs="+")
    lk.add_argument("--hash", default="murmur64a",
                    help="hash to assume for go-qfext-format files")
    lk.set_defaults(fn=cmd_lookup)

    m = sub.add_parser("merge", help="merge filter files (counters add)")
    m.add_argument("out")
    m.add_argument("inputs", nargs="+")
    m.add_argument("--hash", default="murmur64a",
                   help="hash to assume for go-qfext-format inputs")
    m.set_defaults(fn=cmd_merge)

    d = sub.add_parser("describe", help="print filter file metadata")
    d.add_argument("filter")
    d.add_argument("--hash", default="murmur64a")
    d.set_defaults(fn=cmd_describe)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
