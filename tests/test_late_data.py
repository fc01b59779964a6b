"""q40 late-arrival windows: non-vacuity + engine/oracle agreement.

The driver's hash check proves engine == oracle; this test proves the
check MEANS something — the permuted stream actually drops rows (the
oracle total is strictly below the input count) AND actually admits
some late rows (strictly above input-minus-late), so both sides of the
window_end <= watermark boundary are exercised.
"""

from __future__ import annotations

import duckdb
import pytest

from watermark_remove_spark.queries import (
    ORACLES,
    QUERIES,
    _derived_pages_pandas,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_rows():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(ORACLES["q40_late_data_windows"]).fetchall()


def test_late_drop_is_nonvacuous(oracle_rows):
    pages, _ = _derived_pages_pandas(SF_DIR)
    n_input = len(pages)
    doc_id = pages["url"].str.rsplit("/", n=1).str[-1].astype(int)
    n_late = int((doc_id % 10 == 7).sum())
    admitted = sum(r[2] for r in oracle_rows)  # n_pages column
    assert n_late > 0
    # some rows ARE dropped (late set hit finalized windows) ...
    assert admitted < n_input
    # ... and some late rows ARE admitted (open windows at the tail)
    assert admitted > n_input - n_late


def test_q40_engine_matches_oracle(spark, oracle_rows):
    got = sorted(
        (r.window_start_epoch, r.lang, r.n_pages, r.total_chars)
        for r in QUERIES["q40_late_data_windows"](spark, SF_DIR).collect()
    )
    want = sorted((int(r[0]), r[1], int(r[2]), int(r[3])) for r in oracle_rows)
    assert got == want
