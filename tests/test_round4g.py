"""Round-4g operators: retention cohorts, Pareto quality skyline,
Markov transition matrix.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the shared answers have the operators' defining *shapes*:
cohort identities (offset-0 retention == cohort size, monotone
non-increasing cumulative membership), skyline dominance (no returned
point dominated by ANY doc; every excluded doc dominated by some
frontier point), and transition-matrix stochasticity (rows sum to
their totals, ppm rows sum to ~1e6 under floor division).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cohort_identities(spark):
    from watermark_remove_spark.queries import q127_retention_cohorts

    rows = q127_retention_cohorts(spark, SF).collect()
    assert rows, "empty cohort matrix"
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_epoch"], []).append(r)
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    )
    assert sum(rs[0]["n_cohort"] for rs in by_cohort.values()) == n_users
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["offset_days"])
        # day 0: every cohort member is active on their first-seen day
        assert rs[0]["offset_days"] == 0, cohort
        assert rs[0]["n_active"] == rs[0]["n_cohort"], cohort
        assert rs[0]["retention_ppm"] == 1_000_000, cohort
        for r in rs:
            assert 0 < r["n_active"] <= r["n_cohort"], (cohort, r)
            assert r["retention_ppm"] == 1_000_000 * r["n_active"] // r["n_cohort"]
            assert r["offset_days"] >= 0


def test_skyline_dominance_exact(spark):
    from watermark_remove_spark.queries import q128_quality_skyline

    front = [
        (r["n_chars"], r["density_ppm"], r["doc_id"])
        for r in q128_quality_skyline(spark, SF).collect()
    ]
    assert front, "empty frontier"
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("x"),
            F.expr(
                "1000000 * size(filter(split(text, ' '), t -> t != '')) div n_chars"
            ).alias("y"),
        )
        .collect()
    )
    pts = [(r["x"], r["y"], r["doc_id"]) for r in docs]

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and (a[0] > b[0] or a[1] > b[1])

    front_ids = {d for _, _, d in front}
    # no frontier point is dominated by any document
    for f in front:
        assert not any(dominates(p, f) for p in pts if p[2] != f[2]), f
    # every non-frontier document is dominated by some frontier point
    for p in pts:
        if p[2] not in front_ids:
            assert any(dominates(f, p) for f in front), p


def test_markov_rows_are_stochastic(spark):
    from watermark_remove_spark.queries import q129_markov_transitions

    rows = q129_markov_transitions(spark, SF).collect()
    assert rows, "no transitions"
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for from_type, rs in by_from.items():
        total = rs[0]["row_total"]
        assert all(r["row_total"] == total for r in rs), from_type
        assert sum(r["n"] for r in rs) == total, from_type
        ppm_sum = sum(r["p_ppm"] for r in rs)
        # floor division loses < 1 ppm per cell
        assert 1_000_000 - len(rs) < ppm_sum <= 1_000_000, (from_type, ppm_sum)
        for r in rs:
            assert r["p_ppm"] == 1_000_000 * r["n"] // total


def test_markov_session_gap_breaks_chain(spark):
    # two events 31 min apart must NOT produce a transition; 29 min must
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "ts": pd.to_datetime(
                    [
                        "2026-01-01 00:00:00",
                        "2026-01-01 00:31:00",  # gap > 30 min: no edge
                        "2026-01-02 00:00:00",
                        "2026-01-02 00:29:00",  # gap <= 30 min: edge
                    ]
                ),
                "user_id": [7, 7, 8, 8],
                "event_type": ["a", "b", "c", "d"],
                "value": [0.0] * 4,
                "props": ["{}"] * 4,
            }
        )
    )
    import tempfile

    from watermark_remove_spark.queries import q129_markov_transitions

    tmp = tempfile.mkdtemp(prefix="wrs-q129-")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in q129_markov_transitions(spark, tmp).collect()
    }
    assert got == {("c", "d"): 1}


def test_admission_quota_binds_across_batches(spark, tmp_path):
    # 4 events of ONE (type, hour) key split 2+2 across micro-batches:
    # the admitted count must persist in state, so exactly the first 2
    # are admitted — not 2 per batch.
    import pandas as pd

    from watermark_remove_spark.queries import _drain
    from watermark_remove_spark.sources.pages import (
        stream_events_files,
        write_batch_files,
    )
    from watermark_remove_spark.streaming.admission import admission_quota_stream

    def ev_batch(ids, secs):
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts": [pd.Timestamp("2026-03-01") + pd.Timedelta(seconds=s) for s in secs],
                "user_id": [1] * len(ids),
                "event_type": ["a"] * len(ids),
                "value": [0.0] * len(ids),
                "props": ["{}"] * len(ids),
            }
        )

    src = str(tmp_path / "src")
    write_batch_files([ev_batch([1, 2], [0, 10]), ev_batch([3, 4], [20, 30])], src)
    admitted = admission_quota_stream(stream_events_files(spark, src, 1), quota=2)
    got = sorted(r["event_id"] for r in _drain(admitted, spark).collect())
    assert got == [1, 2]


def test_admission_quota_cap_respected(spark):
    from watermark_remove_spark.queries import q130_streaming_admission_quota

    rows = q130_streaming_admission_quota(spark, "/root/testdata/sf0.001").collect()
    assert rows, "nothing admitted"
    cells = {}
    for r in rows:
        cells[(r["event_type"], r["window_epoch"])] = (
            cells.get((r["event_type"], r["window_epoch"]), 0) + 1
        )
    assert all(n <= 2 for n in cells.values())
    assert any(n == 2 for n in cells.values()), "quota never reached — cap vacuous"
    # admitted rows fall inside their window
    for r in rows:
        assert r["window_epoch"] <= r["ts_epoch"] < r["window_epoch"] + 3600
