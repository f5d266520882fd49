"""qfspark command line (mirrors the reference CLI, cmd/main.go:22-143).

  python -m qfspark.cli build    <out.qf> --input lines.txt|table.parquet
                                 [--column url] [--counter-bits N]
                                 [--hash murmur64a] [--bit-packed]
                                 [--expected-entries N] [--spark]
  python -m qfspark.cli lookup   <filter.qf> <key> [...]
  python -m qfspark.cli describe <filter.qf>
  python -m qfspark.cli sketch   distinct|topk|quantiles|f2|setops|sample
                                 --input lines.txt|table.parquet
                                 [--column c] [--p 12] [--k 20]
                                 [--qs 0.5,0.9] [--quantile-sketch kll]

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


def _read_keys_df(args):
    """Shared input reader for Spark-backed subcommands: parquet column
    or newline-delimited text. Reuses an active session (tests) or
    creates one (returned flag says whether we own it)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    spark = (
        active
        or SparkSession.builder.master(args.master)
        .appName("qfspark-sketch").getOrCreate()
    )
    if args.input.endswith(".parquet"):
        df = spark.read.parquet(args.input)
        col = args.column or df.columns[0]
    else:
        df = spark.read.text(args.input).withColumnRenamed("value", "key")
        col = "key"
    return spark, active is None, df, col


def cmd_sketch(args) -> int:
    """Approximate aggregates over a file without writing a job:
    distinct count (HLL), heavy hitters (Misra-Gries), quantiles
    (t-digest / KLL), second frequency moment (AMS)."""
    from pyspark.sql import functions as F

    from . import sketches

    spark, owned, df, col = _read_keys_df(args)
    try:
        by = [c for c in (args.by or "").split(",") if c]
        if args.what == "distinct":
            if by:
                rows = sketches.hll_cardinality_by(
                    df, col, by, p=args.p).orderBy(*by).collect()
                bound = sketches.hll_error_bound(args.p, sigmas=1.0)
                for r in rows:
                    g = ",".join(str(r[c]) for c in by)
                    print(f"{g}\tdistinct ~= {r.estimate:.0f}")
                print(f"# p={args.p}, +/-{bound:.2%} at 1 sigma per group")
            else:
                row = sketches.hll_cardinality(df, col, p=args.p).collect()[0]
                bound = sketches.hll_error_bound(args.p, sigmas=1.0)
                print(f"distinct ~= {row.estimate:.0f}  "
                      f"(p={args.p}, +/-{bound:.2%} at 1 sigma)")
        elif args.what == "topk":
            if by:
                sk = sketches.mg_summary_by(df, col, by, k=args.k).cache()
                rows = (sk.where(F.col("item").isNotNull())
                        .orderBy(*by, F.desc("est"), "item").collect())
                errs = {tuple(r[c] for c in by): r.err
                        for r in sk.where(F.col("item").isNull()).collect()}
                for r in rows:
                    g = tuple(r[c] for c in by)
                    err = errs.get(g, 0)
                    print(f"{','.join(map(str, g))}\t{r.item}"
                          f"\t[{r.est}, {r.est + err}]")
                print(f"# k={args.k} counters per group; per-group "
                      f"undercount budgets {dict((','.join(map(str, g)), e) for g, e in sorted(errs.items()))}")
            else:
                sk = sketches.mg_summary(df, col, k=args.k)
                err = sketches.mg_error(sk).first().err
                rows = (sketches.mg_estimates(sk)
                        .orderBy(F.desc("est"), "item").collect())
                for r in rows:
                    print(f"{r.item}\t[{r.est}, {r.est + err}]")
                print(f"# {len(rows)} counters; undercount budget err={err}")
        elif args.what == "quantiles":
            qs = [float(x) for x in args.qs.split(",")]
            if by:
                # grouped path: per-group KLL (O(1/k) rank error),
                # merged on executors — one pass however many groups
                rows = sketches.kll_quantiles_by(
                    df.select(*by,
                              F.col(col).cast("double").alias(col)),
                    col, by, qs, k=args.kll_k).orderBy(*by, "q").collect()
                for r in rows:
                    g = ",".join(str(r[c]) for c in by)
                    print(f"{g}\tq{r.q:g}\t{r.est}")
                print(f"# grouped KLL, k={args.kll_k} "
                      f"(rank error ~ 12/k per group)")
            else:
                vals = df.select(F.col(col).cast("double").alias(col))
                if args.quantile_sketch == "tdigest":
                    d = sketches.tdigest_build(vals, col,
                                               args.compression)
                else:
                    d = sketches.kll_build(vals, col, args.kll_k)
                for q in qs:
                    print(f"q{q:g}\t{d.quantile(q)}")
        elif args.what == "f2":
            row = sketches.ams_f2_estimate(
                sketches.ams_f2_table(df, col, args.depth, args.width),
                args.depth, args.width).collect()[0]
            print(f"F2 ~= {row.f2_estimate:.0f}  "
                  f"(depth={args.depth}, width={args.width})")
        elif args.what == "sample":
            if not args.weight_column:
                raise SystemExit("sample requires --weight-column")
            if by:
                sk = sketches.priority_sample_by(
                    df, col, args.weight_column, by, k=args.k)
                rows = (sketches.priority_estimates_by(sk, by, k=args.k)
                        .orderBy(*by, F.desc("est_weight"), "key")
                        .collect())
                for r in rows:
                    g = ",".join(str(r[c]) for c in by)
                    print(f"{g}\t{r.key}\tw={r.w:g}"
                          f"\test={r.est_weight:g}")
            else:
                sk = sketches.priority_sample(
                    df, col, args.weight_column, k=args.k)
                rows = (sketches.priority_estimates(sk, k=args.k)
                        .orderBy(F.desc("est_weight"), "key").collect())
                for r in rows:
                    print(f"{r.key}\tw={r.w:g}\test={r.est_weight:g}")
            print(f"# priority sample, k={args.k}: sum(est) over any "
                  "subset of printed keys is an unbiased estimate of "
                  "that subset's true weight sum")
        elif args.what == "ratesample":
            if by:
                rates = {}
                for kv in (args.rates or "").split(","):
                    if kv:
                        g, r = kv.split("=")
                        rates[g] = float(r)
                out = sketches.rate_sample_by(
                    df, col, by, rates, default_rate=args.rate)
            else:
                out = sketches.rate_sample(df, col, args.rate)
            n_in = df.count()
            n_out = out.count()
            for r in out.limit(20).collect():
                print("\t".join(str(r[c]) for c in out.columns))
            print(f"# kept {n_out}/{n_in} rows "
                  f"(deterministic consistent-hash sample; nested "
                  f"under rate changes)")
        elif args.what == "setops":
            if not args.input_b:
                raise SystemExit("setops requires --input-b")
            if args.input_b.endswith(".parquet"):
                df_b = spark.read.parquet(args.input_b)
                col_b = args.column_b or args.column or df_b.columns[0]
            else:
                df_b = (spark.read.text(args.input_b)
                        .withColumnRenamed("value", "key"))
                col_b = "key"
            r = sketches.kmv_set_ops(
                df.selectExpr(f"{col} AS key"),
                df_b.selectExpr(f"{col_b} AS key"),
                "key", k=args.kmv_k).collect()[0]
            print(f"|A| ~= {r.est_a:.0f}  |B| ~= {r.est_b:.0f}  "
                  f"|A u B| ~= {r.est_union:.0f}")
            print(f"jaccard ~= {r.jaccard:.4f}  "
                  f"|A n B| ~= {r.est_intersection:.0f}")
            print(f"|A \\ B| ~= {r.est_a_minus_b:.0f}  "
                  f"|B \\ A| ~= {r.est_b_minus_a:.0f}")
    finally:
        if owned:
            spark.stop()
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

    sk = sub.add_parser(
        "sketch", help="approximate aggregates over text lines or parquet")
    sk.add_argument("what",
                    choices=["distinct", "topk", "quantiles", "f2",
                             "setops", "sample", "ratesample"])
    sk.add_argument("--input", required=True)
    sk.add_argument("--input-b", default=None,
                    help="second key set for setops (KMV jaccard/"
                         "intersection)")
    sk.add_argument("--column", default=None)
    sk.add_argument("--column-b", default=None)
    sk.add_argument("--by", default=None,
                    help="comma-separated group columns (parquet input): "
                         "per-group distinct/topk rollups in one pass")
    sk.add_argument("--kmv-k", type=int, default=256)
    sk.add_argument("--weight-column", default=None,
                    help="weight column for 'sample' (priority "
                         "sampling: unbiased subset-sum estimates)")
    sk.add_argument("--rate", type=float, default=0.1,
                    help="keep rate for 'ratesample' (also the "
                         "default rate for groups absent from --rates)")
    sk.add_argument("--rates", default=None,
                    help="per-group rates for 'ratesample --by g': "
                         "'en=0.5,de=1.0' (unlisted groups get --rate)")
    sk.add_argument("--master", default="local[*]")
    sk.add_argument("--p", type=int, default=12, help="HLL precision")
    sk.add_argument("--k", type=int, default=20,
                    help="Misra-Gries counter budget")
    sk.add_argument("--qs", default="0.5,0.9,0.99")
    sk.add_argument("--quantile-sketch", default="tdigest",
                    choices=["tdigest", "kll"])
    sk.add_argument("--compression", type=int, default=100)
    sk.add_argument("--kll-k", type=int, default=256)
    sk.add_argument("--depth", type=int, default=5)
    sk.add_argument("--width", type=int, default=16)
    sk.set_defaults(fn=cmd_sketch)

    d = sub.add_parser("describe", help="print filter file metadata")
    d.add_argument("filter")
    d.add_argument("--hash", default="murmur64a")
    d.set_defaults(fn=cmd_describe)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
