"""Typed readers for the driver test tables + generic format readers.

The reference's per-source connectors (Hive/MySQL/ES/Influx/PG, SURVEY.md
§2.1) collapse into declarative `spark.read` calls here: predicates and
projections are authored on the DataFrame and Catalyst pushes them into
the scan (PushedFilters / ReadSchema — asserted in tests/plans).
JDBC-style sources are expressed the same way on a cluster
(`spark.read.format('jdbc')`); this sandbox has no external databases,
so parquet stands in for every source system.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver test table (TESTDATA.md): parquet scan with pushdown."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV scan with explicit schema (inferSchema is a double scan —
    never in production; reference analog: dask usecols column pruning,
    geoinfo/main.py:243-255)."""
    r = spark.read.option("header", True)
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def write_csv_single(df: DataFrame, path: str) -> None:
    """K8: single-file CSV export (reference: geoinfo/main.py:259-267
    ``to_csv(single_file=True)``). ``coalesce(1)`` funnels the plan into
    one task — correct ONLY for small exports (reports, dimension dumps);
    a large extract should drop the coalesce and write per-partition
    files. The coalesce is applied at the WRITE, so upstream stages keep
    their full parallelism."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
