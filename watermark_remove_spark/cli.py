"""O-3: the spark-submit job entry (reference counterpart:
``scripts/remove_single_image.py:19-40`` — argparse CLI that validates
input, runs the transform, reports the output location / exits 1).

Production shape (north_rule):

    spark-submit --master <cluster> --py-files watermark_remove_spark.zip \
        -m watermark_remove_spark.cli \
        --input /data/pages --output /data/out --checkpoint /ck \
        [--templates /data/domain_templates] [--watermark "10 minutes"]

Batch mode (``--mode batch``) runs mine → clean → write; streaming mode
(default) runs the full exactly-once pipeline until drained
(``--available-now``) or indefinitely.

Serving subcommands (reference counterpart ``api/main.py:33-59``,
implemented in ``serve.py``):

    ... cli query <sink_dir> [--where SQL] [--select c1,c2] [--limit N]
        [--lineage] [--format table|csv|json|parquet|count] [--output PATH]
    ... cli process --input pages.parquet --output cleaned.parquet
    ... cli compact <sink_dir> [--vacuum]   # small-file maintenance
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="watermark-remove-spark")
    ap.add_argument("--input", required=True, help="pages parquet dir / table path")
    ap.add_argument("--output", required=True, help="sink directory")
    ap.add_argument("--checkpoint", help="checkpoint dir (streaming mode)")
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--window", default="10 minutes")
    ap.add_argument("--files-per-trigger", type=int, default=16)
    # BooleanOptionalAction: --no-available-now switches to continuous
    # streaming (round-1 advice: store_true+default=True could never be
    # turned off, making the documented 'run indefinitely' unreachable)
    ap.add_argument(
        "--available-now", action=argparse.BooleanOptionalAction, default=True
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--lineage", help="JSONL lineage metrics path")
    ap.add_argument(
        "--quarantine",
        action="store_true",
        help="stream mode: decode html in-stream and route undecodable "
        "pages to the sink's quarantine output instead of failing",
    )
    ap.add_argument(
        "--timeout-sec",
        type=float,
        default=None,
        help="continuous mode (--no-available-now): stop gracefully "
        "after this many seconds instead of running forever",
    )
    ap.add_argument(
        "--stop-after-rows",
        type=int,
        default=None,
        help="continuous mode: poll the sink ledger and stop once this "
        "many rows are committed (bounded drain keyed to OUTCOME, not "
        "wall clock; --timeout-sec becomes the loud-failure deadline)",
    )
    return ap


def build_query_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="watermark-remove-spark query")
    ap.add_argument("sink_dir", help="exactly-once sink directory (ledgered)")
    ap.add_argument("--where", help="SQL predicate (pushed down to the scan)")
    ap.add_argument("--select", help="comma-separated column projection")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--lineage", action="store_true", help="query lineage/metrics")
    ap.add_argument(
        "--format",
        choices=["table", "csv", "json", "parquet", "count"],
        default="table",
    )
    ap.add_argument("--output", help="required for csv/json/parquet export")
    ap.add_argument("--master", default=None)
    return ap


def query_main(argv: list[str]) -> int:
    args = build_query_parser().parse_args(argv)
    from .serve import ServeError, export_result, query_committed
    from .session import build_session

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name="wrs-query", master=args.master)
    try:
        cols = args.select.split(",") if args.select else None
        df = query_committed(
            spark,
            args.sink_dir,
            where=args.where,
            columns=cols,
            limit=args.limit,
            lineage=args.lineage,
        )
        if args.format == "count":
            print(df.count())
        elif args.format == "table":
            df.show(args.limit or 20, truncate=40)
        else:
            if not args.output:
                print("--output is required for export formats", file=sys.stderr)
                return 1
            print(export_result(df, args.output, args.format))
        return 0
    except ServeError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


def suite_main(argv: list[str]) -> int:
    """``cli suite <query_name> --sf-dir DIR`` — run any catalog query
    (the same surface the correctness harness checks) against a parquet
    table directory; ``cli suite --list`` enumerates the catalog."""
    ap = argparse.ArgumentParser(prog="watermark-remove-spark suite")
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--list", action="store_true", help="list catalog queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument(
        "--format", choices=["table", "csv", "json", "parquet", "count"],
        default="table",
    )
    ap.add_argument("--output", help="export path (csv/json/parquet)")
    ap.add_argument("--limit", type=int)
    args = ap.parse_args(argv)

    from .queries import QUERIES

    if args.list or not args.name:
        for name in QUERIES:
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query: {args.name} (use --list)", file=sys.stderr)
        return 1

    from .serve import export_result
    from .session import build_session

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name="wrs-suite", master=args.master)
    try:
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.limit:
            df = df.limit(args.limit)
        if args.format == "count":
            print(df.count())
        elif args.format == "table":
            df.show(args.limit or 20, truncate=40)
        else:
            if not args.output:
                print("--output is required for export formats", file=sys.stderr)
                return 1
            print(export_result(df, args.output, args.format))
        return 0
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


def process_main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="watermark-remove-spark process")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    from .serve import ServeError, process_single
    from .session import build_session

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name="wrs-process", master=args.master)
    try:
        print(process_single(spark, args.input, args.output))
        return 0
    except ServeError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


def compact_main(argv: list[str]) -> int:
    """Maintenance: consolidate per-micro-batch dirs into one
    generation; --vacuum removes superseded dirs afterwards."""
    ap = argparse.ArgumentParser(prog="watermark-remove-spark compact")
    ap.add_argument("sink_dir")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    from .session import build_session
    from .streaming.sink import ParquetLedgerSink

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name="wrs-compact", master=args.master)
    try:
        sink = ParquetLedgerSink(args.sink_dir)
        rec = sink.compact(spark)
        if rec is None:
            print("nothing to compact")
        else:
            print(
                f"compacted {len(rec['batches'])} batches "
                f"({rec['n_rows']} rows) -> gen={rec['compaction']}"
            )
        if args.vacuum:
            removed = sink.vacuum()
            print(f"vacuumed {len(removed)} superseded dirs")
        return 0
    finally:
        if owns_session:
            spark.stop()


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    if argv and argv[0] == "suite":
        return suite_main(argv[1:])
    if argv and argv[0] == "process":
        return process_main(argv[1:])
    if argv and argv[0] == "compact":
        return compact_main(argv[1:])
    args = build_parser().parse_args(argv)

    from .operators.extract import clean_pages_udf_fast, mine_masks
    from .session import build_session
    from .sources.pages import read_pages_batch
    from .streaming.sink import ParquetLedgerSink

    from pyspark.sql import SparkSession

    # getOrCreate may hand back a caller-owned session (tests, notebooks)
    # — only stop what this entry point itself created
    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(
        app_name="watermark-remove-spark",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        streaming=args.mode == "stream",
    )
    try:
        pages = read_pages_batch(spark, args.input)
        masks = mine_masks(pages)
        masks.cache().count()

        if args.mode == "batch":
            out = clean_pages_udf_fast(pages, masks)
            out.write.mode("overwrite").parquet(args.output)
            print(f"wrote cleaned pages to {args.output}")
            return 0

        if not args.checkpoint:
            print("--checkpoint is required in stream mode", file=sys.stderr)
            return 1

        from .streaming.pipeline import (
            build_clean_stream,
            build_decode_clean_stream,
            build_window_stream,
            run_stream_to_sink,
        )

        if args.lineage:
            from .streaming.lineage import attach_lineage_listener

            attach_lineage_listener(spark, args.lineage)

        if args.quarantine:
            # cleaned-rows sink with quarantine routing (no window agg:
            # the error column must survive to the sink)
            sink = ParquetLedgerSink(args.output, quarantine_col="error")
            out_stream = build_decode_clean_stream(
                spark, args.input, masks, args.watermark, args.files_per_trigger
            )
        else:
            sink = ParquetLedgerSink(args.output)
            cleaned = build_clean_stream(
                spark, args.input, masks, args.watermark, args.files_per_trigger
            )
            out_stream = build_window_stream(cleaned, args.window)
        q = run_stream_to_sink(
            out_stream, sink, args.checkpoint, available_now=args.available_now
        )
        if args.stop_after_rows is not None:
            # outcome-keyed bounded drain: poll the public ledger
            # accessor until the expected rows commit, then a clean
            # stop (checkpoint stays resumable).  Wall-clock is only
            # the loud-failure deadline — never the success condition
            # (a hard 25 s race was flaky under shared-VM load).
            import time as _time

            deadline = _time.time() + (args.timeout_sec or 300.0)
            while _time.time() < deadline:
                if sink.committed_rows() >= args.stop_after_rows:
                    break
                if not q.isActive:
                    break  # surface the stream's own failure below
                _time.sleep(0.5)
            committed = sink.committed_rows()
            q.stop()
            q.awaitTermination(60)
            if committed < args.stop_after_rows:
                print(
                    f"error: drain committed {committed}/"
                    f"{args.stop_after_rows} rows before the "
                    f"{args.timeout_sec or 300.0}s deadline",
                    file=sys.stderr,
                )
                return 1
        elif args.timeout_sec is not None:
            # bounded continuous run: drain until the deadline, then a
            # clean stop (checkpoint stays resumable)
            q.awaitTermination(args.timeout_sec)
            if q.isActive:
                q.stop()
                q.awaitTermination(60)
        else:
            q.awaitTermination()
        print(
            f"drained: {len(sink.committed_batches())} batches committed to {args.output}"
        )
        return 0
    except Exception as e:  # CLI contract: report + exit 1 (reference :61-66)
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
