"""Catalog seam: Iceberg when the runtime jar is present, Parquet
directory layout otherwise (SURVEY §7 step 5).

The sandbox is offline with no Iceberg jar (verified in SURVEY header),
so tests exercise ``ParquetCatalog``; ``IcebergCatalog`` carries the
production configuration and is selected automatically when the
extension classes are loadable.  Both present the SAME method set
(write_pages / read_table / read_stream / write_table /
ensure_pages_table), so the pipeline never branches on the backend.

Scale posture encoded here (SURVEY §4): sink tables partitioned by
day(warc_ts) and bucketed by domain so (a) time-range queries prune
partitions, (b) per-domain mask joins and aggregations co-locate
without a shuffle when both sides share the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ParquetCatalog:
    """Filesystem-parquet implementation of the table seam."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def write_pages(self, df: DataFrame, name: str = "pages") -> None:
        (
            df.withColumn("warc_day", F.to_date("warc_ts"))
            .repartition("warc_day")
            .write.mode("overwrite")
            .partitionBy("warc_day")
            .parquet(self._path(name))
        )

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def read_stream(self, name: str) -> DataFrame:
        df = self.read_table(name)  # schema from the existing table
        return self.spark.readStream.schema(df.schema).parquet(self._path(name))

    def ensure_pages_table(self, name: str = "pages") -> None:
        """No-op: parquet dirs are created on first write."""

    def write_table(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self._path(name))


class IcebergCatalog:
    """Iceberg implementation (requires iceberg-spark-runtime on the
    classpath; configuration shown for a production cluster):

        spark.sql.catalog.cc = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.cc.type = hive | rest | hadoop

    Hidden partitioning: days(warc_ts) + bucket(64, domain).
    """

    def __init__(self, spark: SparkSession, catalog: str = "cc", db: str = "web"):
        self.spark = spark
        self.prefix = f"{catalog}.{db}"

    def ensure_pages_table(self, name: str = "pages") -> None:
        self.spark.sql(
            f"""
            CREATE TABLE IF NOT EXISTS {self.prefix}.{name} (
              url STRING, warc_ts TIMESTAMP, html BINARY,
              text STRING, lang STRING, domain STRING
            ) USING iceberg
            PARTITIONED BY (days(warc_ts), bucket(64, domain))
            """
        )

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.format("iceberg").load(f"{self.prefix}.{name}")

    def read_stream(self, name: str) -> DataFrame:
        return (
            self.spark.readStream.format("iceberg")
            .option("stream-from-timestamp", "0")
            .load(f"{self.prefix}.{name}")
        )

    def write_pages(self, df: DataFrame, name: str = "pages") -> None:
        self.ensure_pages_table(name)
        df.writeTo(f"{self.prefix}.{name}").append()

    def write_table(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        # mode='append' must never drop the table
        w = df.writeTo(f"{self.prefix}.{name}").using("iceberg")
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()


def get_catalog(spark: SparkSession, root: str):
    """Auto-select the backend (Iceberg if loadable, else Parquet)."""
    if iceberg_available(spark):
        return IcebergCatalog(spark)
    return ParquetCatalog(spark, root)
