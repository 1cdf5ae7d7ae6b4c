"""Document-lake (MongoDB-analog) adapter tests.

Mirrors the reference's own test matrix for the mongodb adapter
(`adapters/mongodb/schema_inference.rs #[cfg(test)]`: basic / multiple
documents / nested / array / mixed types / to_columns;
`sampling.rs`: ordering detection; `enumeration.rs`: collection listing),
plus the export-document integration the reference exercises in
`mongodb_schema_collection.rs`.
"""

from __future__ import annotations

import json
import os

import pytest

from dbsurveyor_spark.sources.documents import (
    DocumentLakeSource,
    detect_ordering_strategy,
    inferred_to_columns,
    type_name_to_unified,
)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    d = tmp_path_factory.mktemp("doclake")

    def write(name, docs):
        with open(os.path.join(d, f"{name}.jsonl"), "w") as f:
            for doc in docs:
                f.write(json.dumps(doc) + "\n")

    oid = lambda c: {"$oid": c * 24}  # noqa: E731
    date = lambda s: {"$date": s}  # noqa: E731
    write(
        "users",
        [
            {
                "_id": oid("a"),
                "name": "John",
                "age": 30,
                "profile": {"firstName": "John", "lastName": "Doe"},
                "createdAt": date("2024-01-02T00:00:00Z"),
            },
            {
                "_id": oid("b"),
                "name": "Jane",
                "email": "jane@example.com",
                "tags": ["a", "b"],
                "createdAt": date("2024-01-03T00:00:00Z"),
            },
            {
                "_id": oid("c"),
                "name": 42,  # mixed type
                "age": None,  # explicit null
                "createdAt": date("2024-01-01T00:00:00Z"),
            },
        ],
    )
    write("articles", [{"_id": oid("d"), "n": i} for i in range(5)])
    write("unordered", [{"x": 1}, {"x": 2}, {"x": 3}])
    # a malformed line must be skipped, not fail the survey
    with open(os.path.join(d, "users.jsonl"), "a") as f:
        f.write("{not json\n")
    return str(d)


@pytest.fixture(scope="module")
def users_schema(spark, lake):
    return DocumentLakeSource(lake).infer_schema(spark, "users")


def field(schema, name):
    return next(f for f in schema["fields"] if f["name"] == name)


def test_enumeration(spark, lake):
    src = DocumentLakeSource(lake)
    cols = {c["name"]: c for c in src.list_collections(spark)}
    assert set(cols) == {"users", "articles", "unordered"}
    assert cols["articles"]["document_count"] == 5
    assert cols["articles"]["size_bytes"] > 0
    assert cols["articles"]["avg_document_size"] > 0


def test_bad_path_rejected():
    with pytest.raises(ValueError):
        DocumentLakeSource("/nonexistent/dir")


def test_malformed_lines_skipped(spark, lake):
    # 3 valid docs + 1 junk line → 3 parsed documents
    n = DocumentLakeSource(lake).read_collection(spark, "users").count()
    assert n == 3


def test_nested_dot_notation(users_schema):
    # schema_inference.rs test_schema_inferrer_nested_document
    names = {f["name"] for f in users_schema["fields"]}
    assert {"profile", "profile.firstName", "profile.lastName"} <= names


def test_nullability(users_schema):
    # schema_inference.rs test_schema_inferrer_multiple_documents:
    # absent-in-some-docs and explicit-null both ⇒ nullable
    assert field(users_schema, "email")["is_nullable"]
    assert field(users_schema, "age")["is_nullable"]
    assert "null" in field(users_schema, "age")["observed_types"]
    # present in every document, never null ⇒ required
    assert not field(users_schema, "name")["is_nullable"]
    assert not field(users_schema, "_id")["is_nullable"]


def test_mixed_types_tracked(users_schema):
    # schema_inference.rs test_schema_inferrer_mixed_types: the dominant
    # type wins the unified mapping, all observed types are recorded
    f = field(users_schema, "name")
    assert sorted(f["observed_types"]) == ["int64", "string"]
    assert f["unified_type"] == {"String": {"max_length": None}}


def test_extended_json_scalars(users_schema):
    # type_mapping.rs: ObjectId → String{24}, DateTime → tz-aware; the
    # wrappers classify as scalars and are NOT descended into
    assert field(users_schema, "_id")["observed_types"] == ["objectId"]
    assert field(users_schema, "_id")["unified_type"] == {
        "String": {"max_length": 24}
    }
    assert field(users_schema, "createdAt")["observed_types"] == ["date"]
    names = {f["name"] for f in users_schema["fields"]}
    assert "_id.$oid" not in names and "createdAt.$date" not in names


def test_array_typed_not_descended(users_schema):
    # analyze_document_fields recurses into documents "but not arrays"
    f = field(users_schema, "tags")
    assert f["observed_types"] == ["array"]
    assert "Array" in f["unified_type"]


def test_ordinal_positions_contiguous(users_schema):
    ords = sorted(f["ordinal_position"] for f in users_schema["fields"])
    assert ords == list(range(1, len(ords) + 1))
    # parent discovers before its children (depth-first pos-path ordering)
    assert (
        field(users_schema, "profile")["ordinal_position"]
        < field(users_schema, "profile.firstName")["ordinal_position"]
    )


def test_to_columns(users_schema):
    # schema_inference.rs test_to_columns: _id is PK + auto-generated;
    # mixed-type fields carry the comment
    cols = {c["name"]: c for c in inferred_to_columns(users_schema)}
    assert cols["_id"]["is_primary_key"] and cols["_id"]["is_auto_increment"]
    assert not cols["name"]["is_primary_key"]
    assert cols["name"]["comment"] == "Mixed types: int64, string"
    # null is an observed type (record_field counts Bson::Null), so a
    # sometimes-null field is "mixed" exactly as in the reference
    assert cols["age"]["comment"] == "Mixed types: int64, null"
    assert cols["createdAt"]["comment"] is None


def test_type_name_to_unified():
    assert type_name_to_unified("string") == {"String": {"max_length": None}}
    assert type_name_to_unified("int32") == {
        "Integer": {"bits": 32, "signed": True}
    }
    assert type_name_to_unified("bool") == "Boolean"
    assert type_name_to_unified("objectId") == {"String": {"max_length": 24}}
    assert type_name_to_unified("weird") == {"Custom": {"type_name": "weird"}}


def test_detect_ordering_strategy():
    # sampling.rs:48 — timestamp field beats _id beats Unordered
    assert detect_ordering_strategy(["_id", "createdAt"]) == {
        "Timestamp": {"column": "createdAt", "direction": "Descending"}
    }
    assert detect_ordering_strategy(["_id", "x"]) == {
        "PrimaryKey": {"columns": ["_id"]}
    }
    assert detect_ordering_strategy(["x", "y"]) == "Unordered"


def test_sample_most_recent(spark, lake):
    s = DocumentLakeSource(lake).sample_collection(spark, "users", 2)
    assert s["sampling_strategy"] == {"MostRecent": {"limit": 2}}
    assert s["ordering_strategy"] == {
        "Timestamp": {"column": "createdAt", "direction": "Descending"}
    }
    # newest-first by createdAt
    names = [json.loads(r)["name"] for r in s["rows"]]
    assert names == ["Jane", "John"]
    assert s["total_rows"] == 3 and s["sample_size"] == 2


def test_sample_random_deterministic(spark, lake):
    src = DocumentLakeSource(lake)
    s1 = src.sample_collection(spark, "unordered", 2)
    s2 = src.sample_collection(spark, "unordered", 2)
    assert s1["sampling_strategy"] == {"Random": {"limit": 2}}
    assert s1["rows"] == s2["rows"]  # md5-order: reproducible by design


def test_sample_short_collection_warns(spark, lake):
    s = DocumentLakeSource(lake).sample_collection(spark, "unordered", 50)
    assert s["sample_size"] == 3
    assert any("less than requested" in w for w in s["warnings"])


def test_survey_document_validates(spark, lake):
    from dbsurveyor_spark.survey.export import (
        to_markdown,
        to_reference_document,
        validate_schema_doc,
    )

    doc = DocumentLakeSource(lake).survey(spark, name="mydocs")
    assert validate_schema_doc(doc) == []
    assert {t["name"] for t in doc["tables"]} == {
        "users",
        "articles",
        "unordered",
    }
    users = next(t for t in doc["tables"] if t["name"] == "users")
    assert users["primary_key"] == {"name": None, "columns": ["_id"]}
    assert users["row_count"] == 3
    unord = next(t for t in doc["tables"] if t["name"] == "unordered")
    assert unord["primary_key"] is None
    # downstream writers accept the document unchanged
    ref = to_reference_document(doc)
    assert ref["database_info"]["name"] == "mydocs"
    assert "users" in to_markdown(doc)


def test_cli_collect_docs(spark, lake, tmp_path):
    from dbsurveyor_spark import cli
    from dbsurveyor_spark.survey.export import load_schema_json

    out = str(tmp_path / "docs.json")
    rc = cli.main(
        ["collect", f"docs:{lake}", "-o", out, "--name", "clidocs", "--sample", "2"]
    )
    assert rc == 0
    doc = load_schema_json(out)
    assert doc["database_info"]["name"] == "clidocs"
    assert len(doc["samples"]) == 3
    users_sample = next(
        s for s in doc["samples"] if s["table_name"] == "users"
    )
    assert users_sample["sample_size"] == 2


def test_cli_test_docs(lake, capsys):
    from dbsurveyor_spark import cli

    assert cli.main(["test", f"docs:{lake}"]) == 0
    assert "3 collections" in capsys.readouterr().out
    assert cli.main(["test", "docs:/nonexistent"]) == 1
