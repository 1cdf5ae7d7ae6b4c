import json, os
def test_file_lake_collect(spark, tmp_path):
    import duckdb, shutil
    lake = tmp_path / "mixed"
    lake.mkdir()
    (lake / "people.csv").write_text("id,name,email\n1,a,a@x.com\n2,b,b@y.org\n")
    (lake / "logs.jsonl").write_text('{"ts": 1, "msg": "hi"}\n{"ts": 2, "msg": "yo"}\n')
    shutil.copy("/root/testdata/sf0.001/region.parquet", lake / "facts.parquet")
    from dbsurveyor_spark.sources.file_lake import collect_file_lake_schema
    from dbsurveyor_spark.survey.export import validate_schema_doc
    doc = collect_file_lake_schema(spark, str(lake))
    assert validate_schema_doc(doc) == []
    by = {t["name"]: t for t in doc["tables"]}
    assert set(by) == {"people", "logs", "facts"}
    assert by["people"]["row_count"] == 2 and by["people"]["comment"] == "format=csv"
    assert by["logs"]["row_count"] == 2 and by["logs"]["comment"] == "format=jsonl"
    assert by["facts"]["comment"] == "format=parquet"
    warn = doc["collection_metadata"]["warnings"]
    assert any("email" in w for w in warn)  # sensitive-column pass ran

def test_cli_collect_generic_lake(spark, tmp_path):
    from dbsurveyor_spark.cli import main
    lake = tmp_path / "loose"
    lake.mkdir()
    (lake / "t.csv").write_text("a,b\n1,2\n")
    out = tmp_path / "doc.json"
    rc = main(["collect", str(lake), "--output", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert doc["tables"][0]["name"] == "t"
