"""Serving surface — the engine analog of the reference's request loop.

Reference counterpart: ``watermark_remover/api/main.py:33-59`` — a
FastAPI endpoint that (1) accepts one uploaded artifact, (2) runs the
core transform on it, (3) returns the processed artifact as a
``FileResponse``, with guaranteed temp-file cleanup in ``finally``
(:71-77).  SURVEY §2 maps O-5 to a memory/test sink for the analytics
engine, but a real user of the reference still needs the *read* side:
"give me the processed output for this input".

Two public entry points, both thin layers over the committed
exactly-once view (``ParquetLedgerSink.read_committed``) and the batch
clean path — no new query semantics, so nothing here bypasses the
correctness-checked operators:

- ``process_single``: the literal one-shot analog — one input parquet
  of pages in, one cleaned parquet out, temp dirs cleaned up on every
  exit path exactly like the reference's ``finally`` block.
- ``query_committed``: predicate/projection/limit over the ledgered
  sink batches.  Filters are plain SQL strings compiled by Catalyst,
  so predicate pushdown reaches the parquet scan (the committed view
  is an ordinary multi-path parquet read) — at 100 TB this is a
  pruned columnar scan, not a driver-side loop.

Scale note: ``export_result`` coalesces ONLY when the caller asks for
a single local artifact (the FileResponse analog, inherently
single-consumer); the default keeps the cluster-parallel layout.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ServeError(RuntimeError):
    """Raised for request-shaped failures (missing input, bad filter)
    — the CLI maps it to exit 1, as the reference maps processing
    failures to HTTP 4xx/5xx (``api/main.py:61-70``)."""


def _remove_path(path: str) -> None:
    """Remove a previous output whatever its kind — a parquet export is
    a directory, a csv/json export is a file, and callers may switch
    formats between runs against the same path."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def process_single(
    spark: SparkSession, input_path: str, output_path: str, work_dir: str | None = None
) -> str:
    """One-shot request: pages parquet in → cleaned parquet out.

    Mirrors ``api/main.py:45-59``: stage under a temp name, run the
    core transform, move the finished artifact to ``output_path``,
    and remove temp state in ``finally`` no matter which path exits.
    Returns ``output_path``.
    """
    from .operators.extract import clean_pages_udf_fast, mine_masks
    from .sources.pages import read_pages_batch

    if not os.path.exists(input_path):
        raise ServeError(f"input not found: {input_path}")

    base = work_dir or os.path.join(os.path.dirname(output_path) or ".", "_serve_tmp")
    tmp_out = os.path.join(base, f"req-{uuid.uuid4().hex}")
    try:
        pages = read_pages_batch(spark, input_path)
        masks = mine_masks(pages)
        cleaned = clean_pages_udf_fast(pages, masks)
        cleaned.write.mode("overwrite").parquet(tmp_out)
        _remove_path(output_path)
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        shutil.move(tmp_out, output_path)  # cross-device safe
        return output_path
    finally:
        if os.path.exists(tmp_out):
            shutil.rmtree(tmp_out, ignore_errors=True)
        if work_dir is None and os.path.isdir(base) and not os.listdir(base):
            os.rmdir(base)


def query_committed(
    spark: SparkSession,
    sink_dir: str,
    where: str | None = None,
    columns: list[str] | None = None,
    limit: int | None = None,
    lineage: bool = False,
) -> DataFrame:
    """Read the exactly-once committed view of a sink directory.

    ``where`` is a SQL predicate (Catalyst-compiled → pushed to the
    parquet scan), ``columns`` a projection (pruned at the scan).
    ``lineage=True`` returns the per-partition lineage/metrics table
    instead of the data.
    """
    from .streaming.sink import ParquetLedgerSink

    if not os.path.isdir(sink_dir):
        raise ServeError(f"sink directory not found: {sink_dir}")
    sink = ParquetLedgerSink(sink_dir)
    df = sink.read_lineage(spark) if lineage else sink.read_committed(spark)
    if not df.columns:
        return df
    try:
        if where:
            df = df.filter(where)
        if columns:
            df = df.select(*columns)
    except Exception as e:  # bad predicate/column = bad request
        raise ServeError(f"bad query: {e}") from e
    if limit is not None:
        df = df.limit(limit)
    return df


def export_result(df: DataFrame, output_path: str, fmt: str = "parquet") -> str:
    """Write a query result as one local artifact (FileResponse analog:
    ``api/main.py:56-59``).  csv/json coalesce to a single part file
    and move it to ``output_path``; parquet keeps parallel layout."""
    if not df.columns:
        # a sink with nothing committed yields a zero-column frame,
        # which no writer accepts — surface the request-shaped error
        raise ServeError("nothing committed to export")
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(output_path)
        return output_path
    if fmt not in ("csv", "json"):
        raise ServeError(f"unsupported format: {fmt}")
    tmp = output_path + f".tmp-{uuid.uuid4().hex}"
    try:
        w = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(tmp)
        else:
            w.json(tmp)
        part = next(
            (p for p in sorted(os.listdir(tmp)) if p.startswith("part-")), None
        )
        if part is None:
            raise ServeError("export produced no output file")
        _remove_path(output_path)
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        os.rename(os.path.join(tmp, part), output_path)
        return output_path
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
