"""Document-lake source: the MongoDB-adapter analog for schemaless JSON.

Parity: `dbsurveyor-core/src/adapters/mongodb/*` — the reference surveys a
schemaless document store by enumerating collections
(`enumeration.rs:99 list_databases / list_collections`), inferring a schema
from sampled documents (`schema_inference.rs:125 analyze_document`:
dot-notation nested fields, per-field type frequencies, mixed-type
tracking, nullability = absence-or-null, ordinal = first-discovery order),
mapping BSON types to the unified model (`type_mapping.rs:26
map_bson_to_unified`), detecting an ordering strategy from well-known
timestamp field names or `_id` (`sampling.rs:22 TIMESTAMP_FIELD_NAMES`,
`sampling.rs:48 detect_ordering_strategy`), and sampling MostRecent /
Random (`sampling.rs:137 sample_collection`).

No live MongoDB exists in this container, so the lake shape is the one a
100 TB pipeline actually has: directories of JSON-lines files, one
collection per file (a mongoexport/DocumentDB-dump layout). Everything the
reference does per-document in Rust is re-expressed as DataFrame plans:

- **Schema inference is distributed**, not a driver-side sample walk. Each
  line is parsed once into a Spark VARIANT (`try_parse_json`); nested
  fields are discovered with ``max_depth`` chained `variant_explode`
  lateral joins (level N's object values feed level N+1 — one logical
  plan, no driver recursion), then a single groupBy(path, type) →
  groupBy(path) rollup computes occurrence counts, type frequencies, and
  the first-seen ordinal. State per field is O(1); the explode fan-out is
  bounded by document size, so the whole inference is a linear scan at any
  corpus size — the reference's 100-document sample loop can't see rare
  fields; this sees every one.
- **Mongo Extended JSON v2 wrappers** (`{"$oid": ...}`, `{"$date": ...}`,
  `{"$numberLong": ...}`, `{"$binary": ...}`, `{"$numberDecimal": ...}`)
  are recognized as scalar BSON types (objectId/date/int64/binData/
  decimal), mirroring `type_mapping.rs:26` — they classify as scalars and
  are not recursed into.
- **Sampling never global-sorts**: MostRecent is `orderBy(...desc).limit`
  (Spark's TakeOrderedAndProject — per-partition top-N + driver merge) and
  Random is the house deterministic md5-order sample, portable across
  engines.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sampling.rs:22 — field names that signal "order by this, descending" for
# MostRecent sampling.
TIMESTAMP_FIELD_NAMES = (
    "createdAt",
    "created_at",
    "updatedAt",
    "updated_at",
    "modifiedAt",
    "modified_at",
    "timestamp",
    "date",
    "insertedAt",
    "inserted_at",
)

_COLLECTION_EXTS = (".jsonl", ".ndjson", ".json")

# Extended JSON v2 single-key wrappers → BSON scalar type name
# (type_mapping.rs:26 map_bson_to_unified arms).
_EXT_JSON_TYPES = {
    "$oid": "objectId",
    "$date": "date",
    "$numberLong": "int64",
    "$numberInt": "int32",
    "$numberDouble": "double",
    "$numberDecimal": "decimal",
    "$binary": "binData",
    "$timestamp": "timestamp",
}


def _classify_variant(value) -> Any:
    """BSON-ish type name for a VARIANT value (`type_mapping.rs:129
    bson_type_name` analog for JSON-encoded documents).

    Plain JSON only has string/number/bool/null/object/array; the number
    split (int64 vs double) follows what `schema_of_variant` reports, and
    Extended JSON wrapper objects are re-tagged as the scalar they encode.
    """
    sv = F.schema_of_variant(value)
    keys = F.json_object_keys(F.to_json(value))
    ext = F.lit(None).cast("string")
    for k, t in _EXT_JSON_TYPES.items():
        # a wrapper is the single key, or ($binary, …) for binData
        ext = F.when(F.array_contains(keys, k), F.lit(t)).otherwise(ext)
    return (
        F.when(sv == "VOID", F.lit("null"))
        .when(sv == "STRING", F.lit("string"))
        .when(sv == "BIGINT", F.lit("int64"))
        .when(sv == "BOOLEAN", F.lit("bool"))
        .when(sv.startswith("DECIMAL"), F.lit("double"))
        .when(sv.isin("DOUBLE", "FLOAT"), F.lit("double"))
        .when(sv.startswith("ARRAY"), F.lit("array"))
        .when(
            sv.startswith("OBJECT"),
            F.coalesce(ext, F.lit("object")),
        )
        .otherwise(F.lower(sv))
    )


def type_name_to_unified(type_name: str) -> Any:
    """`schema_inference.rs:240 type_name_to_unified` — BSON type name →
    UnifiedDataType tagged value (same encoding as survey/export.py)."""
    return {
        "string": {"String": {"max_length": None}},
        "int32": {"Integer": {"bits": 32, "signed": True}},
        "int64": {"Integer": {"bits": 64, "signed": True}},
        "double": {"Float": {"precision": 53}},
        "bool": "Boolean",
        "date": {"DateTime": {"with_timezone": True}},
        "timestamp": {"DateTime": {"with_timezone": True}},
        "binData": {"Binary": {"max_length": None}},
        "objectId": {"String": {"max_length": 24}},
        "object": "Json",
        "array": {"Array": {"element_type": {"Custom": {"type_name": "unknown"}}}},
        "decimal": {"Float": {"precision": 128}},
    }.get(type_name, {"Custom": {"type_name": type_name}})


def infer_collection_schema(
    docs: DataFrame,
    collection_name: str,
    max_depth: int = 8,
) -> dict[str, Any]:
    """Distributed schema inference over a `(doc_id, doc variant)` frame.

    Mirrors `schema_inference.rs:125-233` (SchemaInferrer::analyze_document
    / finalize) field-for-field:

    - nested objects contribute dot-notation paths (arrays are typed but
      not descended, matching `analyze_document_fields`'s "not arrays of
      documents" rule);
    - ``observed_types`` is every type name seen for the field (sorted —
      the reference's HashMap iteration order is arbitrary);
    - the primary type is the most frequent non-null type (ties broken by
      name for determinism);
    - ``is_nullable`` = missing from some document OR an explicit null;
    - ``ordinal_position`` ranks fields by FIRST DISCOVERY in a
      depth-first scan of documents in corpus order — reproduced with a
      per-level zero-padded position path (parent "03" sorts before child
      "0300" before sibling "04") and `min(struct(doc_id, pos))`. One
      documented deviation: Spark's VARIANT canonicalizes object keys into
      sorted order, so within a single document fields discover in sorted
      key order rather than the JSON text's key order (JSON objects are
      unordered by spec; the reference's insertion-order ordinal is an
      artifact of BSON preserving it). Deterministic either way.

    One explode chain + two aggregation exchanges; no driver loops over
    data. `max_depth` bounds the plan depth the way the reference's call
    stack bounds its recursion.
    """
    spark = docs.sparkSession
    doc_id, path, value, pos = "__doc_id", "__path", "__value", "__pos"
    frontier = docs.select(
        F.col(doc_id),
        F.lit("").alias(path),
        F.col("doc").alias(value),
        F.lit("").alias(pos),
    )
    levels: list[DataFrame] = []
    for _ in range(max_depth):
        typed = frontier.withColumn("__type", _classify_variant(F.col(value)))
        exploded = typed.filter(F.col("__type") == "object").lateralJoin(
            spark.tvf.variant_explode(F.col(value).outer())
        )
        frontier = exploded.select(
            F.col(doc_id),
            F.when(F.col(path) == "", F.col("key"))
            .otherwise(F.concat_ws(".", path, "key"))
            .alias(path),
            F.col("value").alias(value),
            F.concat(F.col(pos), F.lpad(F.col("pos"), 4, "0")).alias(pos),
        )
        levels.append(
            frontier.withColumn("__type", _classify_variant(F.col(value)))
        )
    all_fields = levels[0]
    for lv in levels[1:]:
        all_fields = all_fields.unionByName(lv)

    per_type = all_fields.groupBy(path, "__type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(doc_id, pos)).alias("first_seen"),
    )
    stats = (
        per_type.groupBy(path)
        .agg(
            F.sum("n").alias("occurrences"),
            F.min("first_seen").alias("first_seen"),
            F.sort_array(F.collect_list("__type")).alias("observed_types"),
            # dominant non-null type: max over (count, reversed-name) —
            # deterministic tie-break, nulls never win unless alone
            F.max_by(
                "__type",
                F.when(
                    F.col("__type") != "null", F.struct(F.col("n"), F.col("__type"))
                ),
            ).alias("primary_type"),
        )
        .orderBy("first_seen")
    )
    rows = stats.collect()  # metadata-sized: one row per distinct field path
    total_docs = docs.count()
    fields = []
    for i, r in enumerate(rows):
        primary = r["primary_type"] or "null"
        fields.append(
            {
                "name": r[path],
                "observed_types": list(r["observed_types"]),
                "unified_type": type_name_to_unified(primary),
                "occurrence_count": r["occurrences"],
                "is_nullable": r["occurrences"] < total_docs
                or "null" in r["observed_types"],
                "ordinal_position": i + 1,
            }
        )
    return {
        "collection_name": collection_name,
        "documents_sampled": total_docs,
        "fields": fields,
    }


def inferred_to_columns(schema: dict[str, Any]) -> list[dict[str, Any]]:
    """`schema_inference.rs:59 InferredSchema::to_columns` — Column dicts
    in the export-document shape; `_id` is PK + auto-generated; mixed-type
    fields carry the "Mixed types: …" comment."""
    out = []
    for f in schema["fields"]:
        non_dup = [t for t in dict.fromkeys(f["observed_types"])]
        out.append(
            {
                "name": f["name"],
                "data_type": f["unified_type"],
                "is_nullable": f["is_nullable"],
                "is_primary_key": f["name"] == "_id",
                "is_auto_increment": f["name"] == "_id",
                "default_value": None,
                "comment": (
                    f"Mixed types: {', '.join(non_dup)}" if len(non_dup) > 1 else None
                ),
                "ordinal_position": f["ordinal_position"],
            }
        )
    return out


def detect_ordering_strategy(root_fields: list[str]) -> dict[str, Any]:
    """`sampling.rs:48 detect_ordering_strategy` — timestamp field names
    beat `_id` (ObjectId embeds a timestamp) beat Unordered."""
    for name in TIMESTAMP_FIELD_NAMES:
        if name in root_fields:
            return {
                "Timestamp": {"column": name, "direction": "Descending"}
            }
    if "_id" in root_fields:
        return {"PrimaryKey": {"columns": ["_id"]}}
    return "Unordered"


class DocumentLakeSource:
    """One directory of JSON-lines collections (`<name>.jsonl`), surveyed
    like the reference surveys one MongoDB database."""

    def __init__(self, path: str):
        if not os.path.isdir(path):
            raise ValueError(f"document lake path is not a directory: {path}")
        self.path = path

    # -------------------------------------------------------- enumeration

    def collection_files(self) -> dict[str, str]:
        out = {}
        for entry in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, entry)
            stem, ext = os.path.splitext(entry)
            if os.path.isfile(full) and ext in _COLLECTION_EXTS:
                out[stem] = full
        return out

    def list_collections(self, spark: SparkSession) -> list[dict[str, Any]]:
        """`enumeration.rs:163 list_collections` — name, document count,
        size, average document size."""
        out = []
        for name, file in self.collection_files().items():
            n = self.read_collection(spark, name).count()
            size = os.path.getsize(file)
            out.append(
                {
                    "name": name,
                    "collection_type": "collection",
                    "document_count": n,
                    "size_bytes": size,
                    "avg_document_size": (size // n) if n else None,
                    "index_count": None,
                    "is_capped": False,
                }
            )
        return out

    # -------------------------------------------------------------- reads

    def read_collection(self, spark: SparkSession, name: str) -> DataFrame:
        """`(__doc_id, doc variant, raw string)` frame; bad JSON lines parse
        to null variants and are dropped (the reference's cursor
        deserialization failure analog, minus the hard error)."""
        file = self.collection_files().get(name)
        if file is None:
            raise KeyError(f"no such collection: {name}")
        lines = spark.read.text(file).filter(F.trim("value") != "")
        return (
            lines.select(
                F.monotonically_increasing_id().alias("__doc_id"),
                F.try_parse_json(F.col("value")).alias("doc"),
                F.col("value").alias("raw"),
            )
            .filter(F.col("doc").isNotNull())
        )

    # ---------------------------------------------------------- inference

    def infer_schema(
        self, spark: SparkSession, name: str, max_depth: int = 8
    ) -> dict[str, Any]:
        return infer_collection_schema(
            self.read_collection(spark, name).select("__doc_id", "doc"),
            name,
            max_depth=max_depth,
        )

    # ----------------------------------------------------------- sampling

    def sample_collection(
        self, spark: SparkSession, name: str, sample_size: int = 100
    ) -> dict[str, Any]:
        """`sampling.rs:137 sample_collection` — TableSample-shaped dict.

        MostRecent orders by the detected field's JSON encoding descending
        (ISO-8601 `$date` wrappers and ObjectId hex both sort correctly as
        strings) via `orderBy.limit` = TakeOrderedAndProject: per-partition
        top-N, no global sort. Unordered collections fall back to the
        deterministic md5-order random sample (portable, reproducible —
        where the reference's `$sample` stage explicitly is not; it logs
        that as a warning, we simply don't have the problem).
        """
        df = self.read_collection(spark, name)
        root_fields = [
            r["key"]
            for r in df.select("doc")
            .lateralJoin(spark.tvf.variant_explode(F.col("doc").outer()))
            .select("key")
            .distinct()
            .collect()
        ]
        strategy = detect_ordering_strategy(root_fields)
        warnings: list[str] = []
        if strategy == "Unordered":
            order_expr = F.md5(F.col("raw"))
            sampling = {"Random": {"limit": sample_size}}
        else:
            col = (
                strategy["Timestamp"]["column"]
                if "Timestamp" in strategy
                else strategy["PrimaryKey"]["columns"][0]
            )
            order_expr = F.to_json(
                F.try_variant_get(F.col("doc"), f"$.{col}", "variant")
            ).desc()
            sampling = {"MostRecent": {"limit": sample_size}}
        rows = [
            r["j"]
            for r in df.orderBy(order_expr)
            .limit(sample_size)
            .select(F.to_json("doc").alias("j"))
            .collect()
        ]
        total = df.count()
        if len(rows) < sample_size:
            warnings.append(
                f"collection has only {len(rows)} documents, "
                f"less than requested sample size of {sample_size}"
            )
        return {
            "table_name": name,
            "schema_name": None,
            "sample_size": len(rows),
            "total_rows": total,
            "sampling_strategy": sampling,
            "ordering_strategy": strategy,
            "rows": rows,
            "status": "Success",
            "warnings": warnings,
        }

    # ------------------------------------------------------------- survey

    def survey(
        self, spark: SparkSession, name: str | None = None, max_depth: int = 8
    ) -> dict[str, Any]:
        """Whole-lake schema document in the export shape (the analog of
        `mod.rs:449`'s collect surface assembled into DatabaseSchema)."""
        import time
        from datetime import datetime, timezone

        from ..security import detect_sensitive_columns
        from ..survey.export import COLLECTOR, FORMAT_VERSION

        t_start = time.monotonic()
        tables = []
        total_size = 0
        for cname, file in self.collection_files().items():
            inferred = self.infer_schema(spark, cname, max_depth=max_depth)
            total_size += os.path.getsize(file)
            pk = any(f["name"] == "_id" for f in inferred["fields"])
            tables.append(
                {
                    "name": cname,
                    "schema": None,
                    "columns": inferred_to_columns(inferred),
                    "primary_key": (
                        {"name": None, "columns": ["_id"]} if pk else None
                    ),
                    "foreign_keys": [],
                    "indexes": [],
                    "constraints": [],
                    "comment": None,
                    "row_count": inferred["documents_sampled"],
                }
            )
        return {
            "format_version": FORMAT_VERSION,
            "database_info": {
                "name": name or os.path.basename(self.path.rstrip("/")),
                "size_bytes": total_size,
                "access_level": "Full",
                "collection_status": "Success",
            },
            "tables": tables,
            "views": [],
            "indexes": [],
            "constraints": [],
            "procedures": [],
            "functions": [],
            "triggers": [],
            "custom_types": [],
            "samples": None,
            "quality_metrics": None,
            "collection_metadata": {
                "collector_version": COLLECTOR,
                "collected_at": datetime.now(timezone.utc).isoformat(),
                "collection_duration_ms": int((time.monotonic() - t_start) * 1000),
                # warn_sensitive pass (adapters/config/sampling.rs:44)
                "warnings": detect_sensitive_columns(tables),
            },
        }
