"""File sources: parquet / csv / json readers with survey-friendly defaults.

The lake-native analog of the reference's adapter connect step: point at a
path, get a DataFrame whose scan supports column pruning and predicate
pushdown (parquet) or schema inference with explicit override (csv/json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Raw parquet scan — pruning/pushdown preserved (callers filter on top)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema preferred (inference costs an extra pass at
    scale; PERMISSIVE mode keeps malformed rows visible in a corrupt-record
    column rather than silently dropping them)."""
    reader = (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines; same PERMISSIVE/corrupt-record policy as csv. This is the
    closest analog of the reference's MongoDB adapter surface (documents →
    flattened columns), minus a live mongod."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
