"""Semi-structured (JSON) schema inference over the `events.props` column.

The Spark-native analog of the reference's document-database schema
inference (`dbsurveyor-core/src/adapters/mongodb/schema_inference.rs:1` —
field-presence %, per-field type distribution, example values over sampled
documents): a data lake's JSON columns are exactly MongoDB-shaped documents,
and surveying them is the same job — discover the fields, measure how often
each appears, and classify the dominant value type.

Shape: ONE data-sized explode (`json_object_keys` → (document, field)
rows) → per-field scalar extraction → `groupBy(field)` — agg state is
bounded by the field vocabulary, never by it×7 codegen expressions. This
is deliberately the same plan DuckDB's mirror uses (unnest → extract →
GROUP BY): a thousand-field document store stays one small codegen shape
(the earlier one-aggregate-with-7·|fields|-expressions formulation hit
janino blowup territory and needed a driver key-collect first; this
needs neither). The single `count_distinct` per group plans as a
two-phase aggregate — no Expand duplication of the input.

Type classification happens on the EXTRACTED text (both engines unquote
scalars identically), so a JSON string "123" classifies as integer on both
sides — a documented limitation shared with the oracle. Field names are
restricted to `[A-Za-z0-9_]+` (JSONPath-safe) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

JSON_TABLE = "events"
JSON_COLUMN = "props"
_FIELD_RE = "^[A-Za-z0-9_]+$"
_INT_RE = "^-?[0-9]+$"
_DBL_RE = r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"


def _classify(v: F.Column) -> F.Column:
    """Deterministic type tag for one extracted JSON scalar (text form)."""
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(v.isin("true", "false"), F.lit("boolean"))
        .when(v.rlike(_INT_RE), F.lit("integer"))
        .when(v.rlike(_DBL_RE), F.lit("double"))
        .otherwise(F.lit("string"))
    )


def infer_json_schema(docs: DataFrame, doc_col: str, total: int) -> DataFrame:
    """Schema-infer a JSON string column of ``docs`` (``total`` = row count).

    explode(json_object_keys) → get_json_object(doc, '$.'||field) →
    groupBy(field): agg state is O(|fields|), plan size is O(1) in the
    field vocabulary. present_cnt counts key OCCURRENCES (a present key
    with a JSON-null value still counts — same as the mirror's COUNT(*));
    value-dependent stats skip nulls via standard agg null semantics."""
    kv = docs.select(
        F.col(doc_col).alias("doc"),
        F.explode(F.json_object_keys(F.col(doc_col))).alias("field"),
    ).filter(F.col("field").rlike(_FIELD_RE))
    vals = kv.select(
        "field",
        F.expr("get_json_object(doc, concat('$.', field))").alias("v"),
    ).withColumn("typ", _classify(F.col("v")))
    c_bool, c_int = F.col("c_bool"), F.col("c_int")
    c_dbl, c_str = F.col("c_dbl"), F.col("c_str")
    dominant = (
        F.when(
            (c_bool > 0) & (c_bool >= c_int) & (c_bool >= c_dbl)
            & (c_bool >= c_str),
            F.lit("boolean"),
        )
        .when((c_int > 0) & (c_int >= c_dbl) & (c_int >= c_str), F.lit("integer"))
        .when((c_dbl > 0) & (c_dbl >= c_str), F.lit("double"))
        .when(c_str > 0, F.lit("string"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        vals.groupBy("field")
        .agg(
            F.count(F.lit(1)).alias("present_cnt"),
            F.count_distinct("v").alias("n_distinct"),
            F.min("v").alias("min_example"),
            F.max("v").alias("max_example"),
            F.count(F.when(F.col("typ") == "boolean", 1)).alias("c_bool"),
            F.count(F.when(F.col("typ") == "integer", 1)).alias("c_int"),
            F.count(F.when(F.col("typ") == "double", 1)).alias("c_dbl"),
            F.count(F.when(F.col("typ") == "string", 1)).alias("c_str"),
        )
        .select(
            "field",
            "present_cnt",
            F.round(F.col("present_cnt") * 100.0 / F.lit(total), 3).alias(
                "presence_pct"
            ),
            dominant.alias("dominant_type"),
            "n_distinct",
            "min_example",
            "max_example",
        )
        .orderBy("field")
    )


def survey_json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field: presence %, dominant type, distinct count, examples."""
    ev = load_table(spark, sf_dir, JSON_TABLE).select(JSON_COLUMN)
    total = ev.count()  # parquet-metadata count: plan sizing, not data pull
    return infer_json_schema(ev, JSON_COLUMN, total)


def _json_schema_sql() -> str:
    """DuckDB mirror: dynamic key discovery (unnest json_keys) instead of a
    driver collect, identical classification and tie-break rules."""
    return f"""
WITH total AS (SELECT COUNT(*) AS n FROM events),
kv AS (
  SELECT unnest(json_keys(props::JSON)) AS field, props FROM events
),
vals AS (
  SELECT field, json_extract_string(props::JSON, '$.' || field) AS v
  FROM kv
  WHERE regexp_matches(field, '{_FIELD_RE}')
),
typed AS (
  SELECT field, v,
         CASE WHEN v IS NULL THEN NULL
              WHEN v IN ('true', 'false') THEN 'boolean'
              WHEN regexp_matches(v, '{_INT_RE}') THEN 'integer'
              WHEN regexp_matches(v, '{_DBL_RE}') THEN 'double'
              ELSE 'string' END AS typ
  FROM vals
),
agg AS (
  SELECT field,
         COUNT(*) AS present_cnt,
         COUNT(DISTINCT v) AS n_distinct,
         MIN(v) AS min_example,
         MAX(v) AS max_example,
         COUNT(CASE WHEN typ = 'boolean' THEN 1 END) AS c_bool,
         COUNT(CASE WHEN typ = 'integer' THEN 1 END) AS c_int,
         COUNT(CASE WHEN typ = 'double' THEN 1 END) AS c_dbl,
         COUNT(CASE WHEN typ = 'string' THEN 1 END) AS c_str
  FROM typed GROUP BY field
)
SELECT field, present_cnt,
       round(present_cnt * 100.0 / n, 3) AS presence_pct,
       CASE WHEN c_bool > 0 AND c_bool >= c_int AND c_bool >= c_dbl
                 AND c_bool >= c_str THEN 'boolean'
            WHEN c_int > 0 AND c_int >= c_dbl AND c_int >= c_str
                 THEN 'integer'
            WHEN c_dbl > 0 AND c_dbl >= c_str THEN 'double'
            WHEN c_str > 0 THEN 'string'
            ELSE NULL END AS dominant_type,
       n_distinct, min_example, max_example
FROM agg, total
ORDER BY field
"""


QUERIES = {
    "survey_json_schema_inference": survey_json_schema_inference,
}

ORACLES = {
    "survey_json_schema_inference": _json_schema_sql(),
}
