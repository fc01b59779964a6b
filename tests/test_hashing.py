"""Cross-boundary hash parity: Python xxhash64 == Spark F.xxhash64."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from watermark_remove_spark.hashing import xxhash64_str


def test_xxhash64_matches_spark(spark):
    rng = random.Random(1234)
    samples = [
        "",
        "a",
        "hello world",
        "x" * 31,
        "y" * 32,
        "z" * 33,
        "日本語テキスト",
        "héllo wörld ünïcode",
        " ".join(f"tok{i}" for i in range(100)),
    ]
    samples += [
        "".join(rng.choices(string.printable + "äöüß中文", k=rng.randint(0, 300)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert r.h == xxhash64_str(r.s), repr(r.s)
