"""Storage-layout survey: parquet footer metrics + hazard flags."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from dbsurveyor_spark.survey.storage import (
    storage_report,
    storage_to_markdown,
)


class TestStorageReport:
    def test_testdata_lineitem_flags_single_row_group(self):
        reports = {r["table_name"]: r for r in storage_report("/root/testdata/sf0.1")}
        li = reports["lineitem"]
        assert li["rows"] == 600_000 and li["row_groups"] == 1
        assert "single_row_group" in li["hazards"]
        assert li["max_scan_tasks"] == 1  # the scan-parallelism ceiling
        # small tables are not penalized for a single group
        assert "single_row_group" not in reports["region"]["hazards"]

    def test_multi_group_file_not_flagged(self, tmp_path):
        t = pa.table({"x": list(range(200_000))})
        path = tmp_path / "big.parquet"
        pq.write_table(t, path, row_group_size=50_000)
        (r,) = storage_report(str(tmp_path), tables=["big"])
        assert r["row_groups"] == 4 and r["hazards"] == []
        assert r["max_scan_tasks"] == 4

    def test_tiny_files_hazard_on_fragmented_table(self, tmp_path):
        d = tmp_path / "frag.parquet"
        d.mkdir()
        for i in range(6):
            pq.write_table(pa.table({"x": [i]}), d / f"part-{i}.parquet")
        (r,) = storage_report(str(tmp_path), tables=["frag"])
        assert r["files"] == 6 and "tiny_files" in r["hazards"]

    def test_markdown_and_cli(self, capsys):
        from dbsurveyor_spark.cli import main

        md = storage_to_markdown(storage_report("/root/testdata/sf0.001"))
        assert "| lineitem |" in md
        assert main(["storage", "/root/testdata/sf0.001", "--format", "json"]) == 0
        parsed = json.loads(capsys.readouterr().out)
        assert {r["table_name"] for r in parsed} >= {"lineitem", "orders"}
