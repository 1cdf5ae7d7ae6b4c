"""Live-engine catalog types → unified type model → Spark schema types.

Parity: `dbsurveyor-core/src/adapters/postgres/type_mapping.rs:24
map_postgres_type_to_unified` and `adapters/mysql/type_mapping.rs:27
map_mysql_type`. The reference maps information_schema rows from a live
server into its UnifiedDataType enum; no live server exists in this
container, so these are pure functions over the same inputs
(data_type / udt_name / char length / precision / scale), producing the
tagged-dict encoding the export document already uses
(survey/export.py:_unified_type, schema v1.0 $defs.UnifiedDataType).

`unified_to_spark_ddl` closes the loop for the Spark side: a JDBC
collection that reads information_schema through `JdbcSource.read_query`
can build an explicit Spark schema (customSchema reader option) from the
unified types instead of trusting driver inference — the piece that makes
a 1000-executor partitioned JDBC read deterministic across drivers.
"""

from __future__ import annotations

from typing import Any

# ------------------------------------------------------------ postgres

_PG_STRING = {"character varying", "varchar", "character", "char"}
_PG_INT_BITS = {
    "smallint": 16, "int2": 16,
    "integer": 32, "int": 32, "int4": 32,
    "bigint": 64, "int8": 64,
}
_PG_CUSTOM_PASSTHROUGH = {
    "inet", "cidr", "macaddr", "macaddr8",
    "point", "line", "lseg", "box", "path", "polygon", "circle",
    "tsvector", "tsquery",
}


def map_postgres_type(
    data_type: str,
    udt_name: str = "",
    char_max_length: int | None = None,
    numeric_precision: int | None = None,
    numeric_scale: int | None = None,
    array_element_type: str | None = None,
) -> Any:
    """information_schema.columns row → UnifiedDataType tagged value
    (type_mapping.rs:24; same decision tree, same fallbacks)."""
    t = data_type.lower()
    if t in _PG_STRING:
        return {"String": {"max_length": char_max_length}}
    if t == "text":
        return {"String": {"max_length": None}}
    if t in _PG_INT_BITS:
        return {"Integer": {"bits": _PG_INT_BITS[t], "signed": True}}
    if t in ("real", "float4"):
        return {"Float": {"precision": 24}}
    if t in ("double precision", "float8"):
        return {"Float": {"precision": 53}}
    if t in ("numeric", "decimal"):
        # scale 0 → integer sized by precision; else float w/ precision
        # (type_mapping.rs:63-85)
        if numeric_scale == 0:
            if numeric_precision is not None and numeric_precision <= 4:
                bits = 16
            elif numeric_precision is not None and numeric_precision <= 9:
                bits = 32
            else:
                bits = 64
            return {"Integer": {"bits": bits, "signed": True}}
        return {"Float": {"precision": numeric_precision}}
    if t in ("boolean", "bool"):
        return "Boolean"
    if t in ("timestamp without time zone", "timestamp"):
        return {"DateTime": {"with_timezone": False}}
    if t in ("timestamp with time zone", "timestamptz"):
        return {"DateTime": {"with_timezone": True}}
    if t == "date":
        return "Date"
    if t in ("time without time zone", "time"):
        return {"Time": {"with_timezone": False}}
    if t in ("time with time zone", "timetz"):
        return {"Time": {"with_timezone": True}}
    if t == "bytea":
        return {"Binary": {"max_length": None}}
    if t in ("json", "jsonb"):
        return "Json"
    if t == "uuid":
        return "Uuid"
    if t == "array":
        if array_element_type:
            elem = map_postgres_type(
                array_element_type,
                array_element_type,
                char_max_length,
                numeric_precision,
                numeric_scale,
            )
            return {"Array": {"element_type": elem}}
        return {"Custom": {"type_name": f"{udt_name}[]"}}
    if t in _PG_CUSTOM_PASSTHROUGH or t == "xml":
        return {"Custom": {"type_name": udt_name or t}}
    if t == "user-defined":
        # built-ins surfacing as USER-DEFINED, else enum/custom
        # (type_mapping.rs:154-170)
        if udt_name == "uuid":
            return "Uuid"
        if udt_name in ("json", "jsonb"):
            return "Json"
        return {"Custom": {"type_name": udt_name}}
    # unknown: keep udt detail when it adds information
    # (type_mapping.rs:173-186)
    if udt_name and udt_name != data_type:
        return {"Custom": {"type_name": f"{data_type}({udt_name})"}}
    return {"Custom": {"type_name": data_type}}


# -------------------------------------------------------------- mysql

_MY_TEXT_SIZES = {
    "tinytext": 255,
    "text": 65_535,
    "mediumtext": 16_777_215,
}
_MY_BLOB_SIZES = {
    "tinyblob": 255,
    "blob": 65_535,
    "mediumblob": 16_777_215,
}
_MY_GEO = {
    "geometry", "point", "linestring", "polygon", "multipoint",
    "multilinestring", "multipolygon", "geometrycollection",
}


def map_mysql_type(
    mysql_type: str,
    char_max_length: int | None = None,
    numeric_precision: int | None = None,
    numeric_scale: int | None = None,
) -> Any:
    """MySQL column type → UnifiedDataType tagged value
    (mysql/type_mapping.rs:27; unsigned modifier, TINYINT(1)/BIT(1)
    boolean conventions, sized TEXT/BLOB tiers)."""
    t = mysql_type.lower()
    unsigned = "unsigned" in t
    base = t.replace(" unsigned", "").replace("unsigned ", "").strip()
    if base in ("char", "character", "varchar", "character varying"):
        return {"String": {"max_length": char_max_length}}
    if base in _MY_TEXT_SIZES:
        return {"String": {"max_length": _MY_TEXT_SIZES[base]}}
    if base == "longtext":
        return {"String": {"max_length": None}}
    if base == "tinyint":
        if char_max_length == 1:  # TINYINT(1) = boolean by convention
            return "Boolean"
        return {"Integer": {"bits": 8, "signed": not unsigned}}
    if base == "smallint":
        return {"Integer": {"bits": 16, "signed": not unsigned}}
    if base == "mediumint":
        return {"Integer": {"bits": 24, "signed": not unsigned}}
    if base in ("int", "integer"):
        return {"Integer": {"bits": 32, "signed": not unsigned}}
    if base == "bigint":
        return {"Integer": {"bits": 64, "signed": not unsigned}}
    if base in ("decimal", "numeric", "dec", "fixed"):
        if numeric_scale == 0:
            if numeric_precision is not None and numeric_precision <= 2:
                bits = 8
            elif numeric_precision is not None and numeric_precision <= 4:
                bits = 16
            elif numeric_precision is not None and numeric_precision <= 9:
                bits = 32
            else:
                bits = 64
            return {"Integer": {"bits": bits, "signed": True}}
        return {"Float": {"precision": numeric_precision}}
    if base == "float":
        return {"Float": {"precision": 24}}
    if base in ("double", "double precision", "real"):
        return {"Float": {"precision": 53}}
    if base in ("boolean", "bool"):
        return "Boolean"
    if base == "date":
        return "Date"
    if base == "time":
        return {"Time": {"with_timezone": False}}
    if base == "datetime":
        return {"DateTime": {"with_timezone": False}}
    if base == "timestamp":  # MySQL TIMESTAMP is UTC-normalized
        return {"DateTime": {"with_timezone": True}}
    if base == "year":
        return {"Integer": {"bits": 16, "signed": False}}
    if base in ("binary", "varbinary"):
        return {"Binary": {"max_length": char_max_length}}
    if base in _MY_BLOB_SIZES:
        return {"Binary": {"max_length": _MY_BLOB_SIZES[base]}}
    if base == "longblob":
        return {"Binary": {"max_length": None}}
    if base == "bit":
        if char_max_length == 1:
            return "Boolean"
        bits = char_max_length or 1
        return {"Binary": {"max_length": (bits + 7) // 8}}
    if base == "json":
        return "Json"
    if base in ("enum", "set") or base in _MY_GEO:
        return {"Custom": {"type_name": base}}
    return {"Custom": {"type_name": base}}


# -------------------------------------------- referential actions (FKs)

_REF_ACTIONS = {
    "CASCADE": "Cascade",
    "SET NULL": "SetNull",
    "SET DEFAULT": "SetDefault",
    "RESTRICT": "Restrict",
    "NO ACTION": "NoAction",
}


def map_referential_action(action_rule: str) -> str | None:
    """Catalog action rule → unified action (postgres/type_mapping.rs:277
    map_referential_action; unknown → None, not a guess)."""
    return _REF_ACTIONS.get(action_rule.upper())


# ------------------------------------------------ unified → Spark DDL

_SPARK_INT = {8: "TINYINT", 16: "SMALLINT", 24: "INT", 32: "INT", 64: "BIGINT"}


def unified_to_spark_ddl(unified: Any) -> str:
    """UnifiedDataType tagged value → Spark SQL DDL type string, for an
    explicit `customSchema` on JDBC reads (deterministic schemas across
    driver versions; unsigned ints widen one tier so the value range
    fits). Custom/unknown types land as STRING — the lossless transport
    for types Spark has no native encoding for."""
    if isinstance(unified, str):
        return {
            "Boolean": "BOOLEAN",
            "Date": "DATE",
            "Json": "STRING",
            "Uuid": "STRING",
        }.get(unified, "STRING")
    (tag, body), = unified.items()
    if tag == "String":
        return "STRING"
    if tag == "Integer":
        bits = body["bits"]
        if not body.get("signed", True):
            bits = {8: 16, 16: 32, 24: 32, 32: 64, 64: 64}[bits]
            if body["bits"] == 64:
                return "DECIMAL(20,0)"  # u64 range exceeds BIGINT
        return _SPARK_INT[bits]
    if tag == "Float":
        # the unified encoding overloads precision: 24/53 are IEEE mantissa
        # markers (real/float), other values are NUMERIC decimal digits —
        # only the exact float4 marker narrows to FLOAT; everything else
        # (including digit counts < 24) must keep double range
        return "FLOAT" if body.get("precision") == 24 else "DOUBLE"
    if tag == "DateTime":
        return "TIMESTAMP" if body.get("with_timezone") else "TIMESTAMP_NTZ"
    if tag == "Time":
        return "STRING"  # Spark has no TIME type; transport as ISO string
    if tag == "Binary":
        return "BINARY"
    if tag == "Array":
        return f"ARRAY<{unified_to_spark_ddl(body['element_type'])}>"
    return "STRING"
