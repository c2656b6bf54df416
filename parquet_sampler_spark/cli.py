"""CLI mirroring the reference's two binaries (SURVEY.md §2.3).

Reference usage (README.md:15-26)::

    ./sample <in.parquet> <out.parquet> <ratio>
    ./join <dim.parquet> <dim_key> <sampled_fact.parquet> <fact_key> <out.parquet>

Ours (same positional order; seed made explicit — the reference is
unseeded, sample.rs:42)::

    python -m parquet_sampler_spark.cli sample IN OUT RATIO [--seed S]
        [--key-cols k1,k2] [--method hash|rand]
    python -m parquet_sampler_spark.cli join PROBE PROBE_KEY BUILD
        BUILD_KEY OUT [--null-safe] [--stringly]

Note the ``join`` argument order matches the reference: probe
(to-be-reduced) table first, build (sampled) table second (join.rs:16-21).
"""

from __future__ import annotations

import argparse
import sys

from parquet_sampler_spark.operators.sample import sample_exact
from parquet_sampler_spark.operators.semijoin import semi_join_reduce
from parquet_sampler_spark.session import get_spark
from parquet_sampler_spark.sources.io import (
    metadata_row_count,
    read_parquet,
    write_parquet,
)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="parquet_sampler_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_sample = sub.add_parser("sample", help="exact-count uniform sample")
    p_sample.add_argument("input")
    p_sample.add_argument("output")
    p_sample.add_argument("ratio", type=float)
    p_sample.add_argument("--seed", type=int, default=42)
    p_sample.add_argument(
        "--key-cols", default=None, help="comma-separated integer key columns"
    )
    p_sample.add_argument("--method", choices=["hash", "rand"], default=None)
    p_sample.add_argument("--single-file", action="store_true")
    p_sample.add_argument(
        "--order-preserving", action="store_true",
        help="emit rows in input-file order (reference parity)",
    )
    p_sample.add_argument(
        "--stratify", default=None,
        help="comma-separated strata columns: exact floor(n_g*ratio) "
             "rows per group instead of a global sample",
    )

    p_join = sub.add_parser("join", help="left semi-join reduction")
    p_join.add_argument("probe")
    p_join.add_argument("probe_key")
    p_join.add_argument("build")
    p_join.add_argument("build_key")
    p_join.add_argument("output")
    p_join.add_argument("--null-safe", action="store_true")
    p_join.add_argument("--stringly", action="store_true")
    p_join.add_argument("--no-broadcast", action="store_true")
    p_join.add_argument("--single-file", action="store_true")

    p_dedup = sub.add_parser(
        "dedup", help="deduplicate a parquet table (beyond-reference)"
    )
    p_dedup.add_argument("input")
    p_dedup.add_argument("output")
    p_dedup.add_argument("--id-col", required=True)
    p_dedup.add_argument("--method", default="exact",
                         choices=["exact", "jaccard", "minhash"])
    p_dedup.add_argument("--cols", default=None,
                         help="comma-separated columns (exact mode)")
    p_dedup.add_argument("--text-col", default=None,
                         help="text column (jaccard/minhash modes)")
    p_dedup.add_argument("--ngram", type=int, default=2)
    p_dedup.add_argument("--threshold", type=float, default=0.5)
    p_dedup.add_argument("--single-file", action="store_true")

    p_compact = sub.add_parser(
        "compact", help="rewrite small parquet files into right-sized "
                        "ones (beyond-reference)"
    )
    p_compact.add_argument("input")
    p_compact.add_argument("output")
    p_compact.add_argument("--target-mb", type=int, default=128)

    args = parser.parse_args(argv)
    spark = get_spark(f"psx-{args.cmd}")

    if args.cmd == "compact":
        from parquet_sampler_spark.sources.io import compact_parquet

        n_out = compact_parquet(
            spark, args.input, args.output, target_mb=args.target_mb
        )
        rows = metadata_row_count(args.output)
        print(f"compacted {args.input} -> {n_out} file(s), {rows} rows")
        return 0

    if args.cmd == "dedup":
        from parquet_sampler_spark.operators.dedup import (
            exact_dedup, jaccard_dedup, minhash_dedup,
        )

        if args.method in ("jaccard", "minhash") and not args.text_col:
            parser.error(f"--text-col is required for --method {args.method}")
        df = read_parquet(spark, args.input)
        if args.method == "exact":
            cols = args.cols.split(",") if args.cols else [
                c for c in df.columns if c != args.id_col
            ]
            out = exact_dedup(df, cols, args.id_col)
        elif args.method == "jaccard":
            out = jaccard_dedup(df, args.id_col, args.text_col,
                                n=args.ngram, threshold=args.threshold)
        else:
            out = minhash_dedup(df, args.id_col, args.text_col,
                                n=args.ngram, threshold=args.threshold)
        write_parquet(out, args.output, single_file=args.single_file)
        before = metadata_row_count(args.input)
        after = metadata_row_count(args.output)
        print(f"dedup[{args.method}] {args.input}: {before} -> {after} rows")
        return 0

    if args.cmd == "sample":
        if args.stratify and not args.key_cols:
            parser.error("--stratify requires --key-cols")
        if args.stratify and args.order_preserving:
            parser.error("--order-preserving is not supported with "
                         "--stratify (stratified output has no global "
                         "file order)")
        df = read_parquet(spark, args.input)
        key_cols = args.key_cols.split(",") if args.key_cols else None
        method = args.method or ("hash" if key_cols else "rand")
        n = metadata_row_count(args.input)
        if args.stratify:
            from parquet_sampler_spark.operators.sample import (
                sample_stratified,
            )

            out = sample_stratified(
                df, args.ratio, strata_cols=args.stratify.split(","),
                seed=args.seed, key_cols=key_cols,
            )
        else:
            out = sample_exact(
                df, args.ratio, seed=args.seed, key_cols=key_cols,
                method=method, total_rows=n,
                order_preserving=args.order_preserving,
            )
        write_parquet(out, args.output, single_file=args.single_file)
        n_out = metadata_row_count(args.output)
        print(f"sampled {n_out} of {n} rows -> {args.output}")
    else:
        probe = read_parquet(spark, args.probe)
        build = read_parquet(spark, args.build)
        out = semi_join_reduce(
            probe, args.probe_key, build, args.build_key,
            null_safe=args.null_safe, stringly=args.stringly,
            broadcast=not args.no_broadcast,
        )
        write_parquet(out, args.output, single_file=args.single_file)
        before = metadata_row_count(args.probe)
        after = metadata_row_count(args.output)
        # reduction statistic, as the reference reports (join.rs:131-134)
        print(f"reduced {args.probe}: {before} -> {after} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
