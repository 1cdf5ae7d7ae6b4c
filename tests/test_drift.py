"""Schema-drift diff: change detection across two survey documents."""

from __future__ import annotations

import copy
import json

from dbsurveyor_spark.survey.drift import diff_schema_documents, drift_to_markdown


def _doc(name: str = "db") -> dict:
    return {
        "database_info": {"name": name},
        "tables": [
            {
                "name": "orders",
                "columns": [
                    {"name": "o_orderkey", "data_type": "BIGINT", "is_nullable": False},
                    {"name": "o_custkey", "data_type": "BIGINT", "is_nullable": True},
                    {"name": "o_comment", "data_type": "VARCHAR", "is_nullable": True},
                ],
                "primary_key": {"name": "pk_orders", "columns": ["o_orderkey"]},
                "foreign_keys": [
                    {
                        "name": "fk_orders_o_custkey",
                        "columns": ["o_custkey"],
                        "referenced_table": "customer",
                        "referenced_columns": ["c_custkey"],
                    }
                ],
                "row_count": 1000,
            },
            {
                "name": "customer",
                "columns": [
                    {"name": "c_custkey", "data_type": "BIGINT", "is_nullable": False},
                ],
                "primary_key": {"name": "pk_customer", "columns": ["c_custkey"]},
                "foreign_keys": [],
                "row_count": 100,
            },
        ],
    }


class TestDiff:
    def test_identical_documents_no_changes(self):
        r = diff_schema_documents(_doc(), _doc())
        assert not r["has_changes"]
        assert "No structural changes" in drift_to_markdown(r)

    def test_all_change_kinds_detected(self):
        old, new = _doc("v1"), _doc("v2")
        # table added + removed
        new["tables"].append({"name": "events", "columns": [], "row_count": 5})
        new["tables"] = [t for t in new["tables"] if t["name"] != "customer"]
        t = new["tables"][0]
        # column added, removed, retyped, nullability flip
        t["columns"] = [
            {"name": "o_orderkey", "data_type": "BIGINT", "is_nullable": True},
            {"name": "o_custkey", "data_type": "VARCHAR", "is_nullable": True},
            {"name": "o_status", "data_type": "VARCHAR", "is_nullable": True},
        ]
        # pk + fk changes
        t["primary_key"] = {"name": "pk_orders", "columns": ["o_orderkey", "o_custkey"]}
        t["foreign_keys"] = []
        # row drift beyond 10%
        t["row_count"] = 1500

        r = diff_schema_documents(old, new)
        assert r["has_changes"]
        assert r["tables_added"] == ["events"]
        assert r["tables_removed"] == ["customer"]
        (tc,) = r["table_changes"]
        assert tc["columns_added"] == ["o_status"]
        assert tc["columns_removed"] == ["o_comment"]
        assert tc["columns_retyped"] == [
            {"column": "o_custkey", "old_type": "BIGINT", "new_type": "VARCHAR"}
        ]
        assert tc["nullability_changed"] == [
            {"column": "o_orderkey", "old_nullable": False, "new_nullable": True}
        ]
        assert tc["pk_changed"] == {
            "old": ["o_orderkey"],
            "new": ["o_orderkey", "o_custkey"],
        }
        assert tc["fks_removed"] and not tc["fks_added"]
        assert r["row_drift"] == [
            {"table": "orders", "old_rows": 1000, "new_rows": 1500,
             "rel_change": 0.5}
        ]
        md = drift_to_markdown(r)
        assert "o_custkey" in md and "retyped" in md and "+50.0%" in md

    def test_small_row_drift_below_threshold_ignored(self):
        old, new = _doc(), _doc()
        new["tables"][0]["row_count"] = 1050  # +5% < 10% default
        r = diff_schema_documents(old, new)
        assert not r["has_changes"]
        r2 = diff_schema_documents(old, new, rowcount_drift_min_rel=0.01)
        assert r2["has_changes"] and r2["row_drift"][0]["rel_change"] == 0.05

    def test_real_document_self_diff_is_clean(self, spark):
        from .conftest import SF_SMALL
        from dbsurveyor_spark.survey.export import collect_database_schema

        doc = collect_database_schema(spark, SF_SMALL, infer_keys=False)
        assert not diff_schema_documents(doc, copy.deepcopy(doc))["has_changes"]


class TestCliDiff:
    def test_cli_diff_reports_and_gates(self, tmp_path, capsys):
        from dbsurveyor_spark.cli import main

        old, new = _doc("v1"), _doc("v2")
        new["tables"][0]["columns"].append(
            {"name": "o_newcol", "data_type": "VARCHAR", "is_nullable": True}
        )
        po, pn = tmp_path / "old.json", tmp_path / "new.json"
        po.write_text(json.dumps(old))
        pn.write_text(json.dumps(new))
        assert main(["diff", str(po), str(pn)]) == 0
        out = capsys.readouterr().out
        assert "o_newcol" in out
        assert main(["diff", str(po), str(pn), "--fail-on-change"]) == 2
        capsys.readouterr()
        # json format round-trips
        assert main(["diff", str(po), str(pn), "--format", "json"]) == 0
        parsed = json.loads(capsys.readouterr().out)
        assert parsed["table_changes"][0]["columns_added"] == ["o_newcol"]
        # clean pair exits 0 even with the gate on
        assert main(["diff", str(po), str(po), "--fail-on-change"]) == 0


class TestQualityDrift:
    def _metrics(self, score=0.95, comp=0.9, violations=()):
        return [
            {
                "table_name": "orders",
                "quality_score": score,
                "completeness": {"score": comp},
                "consistency": {"score": 1.0},
                "uniqueness": {"score": 1.0},
                "threshold_violations": [
                    {"metric": m, "threshold": 0.9, "actual": 0.5,
                     "severity": "warning"}
                    for m in violations
                ],
            }
        ]

    def test_no_metrics_no_drift(self):
        from dbsurveyor_spark.survey.drift import diff_quality_metrics

        assert diff_quality_metrics(None, self._metrics()) == []
        assert diff_quality_metrics(self._metrics(), self._metrics()) == []

    def test_score_and_violation_drift_detected(self):
        from dbsurveyor_spark.survey.drift import diff_quality_metrics

        old = self._metrics(score=0.95, comp=0.9)
        new = self._metrics(score=0.80, comp=0.7, violations=("completeness",))
        (d,) = diff_quality_metrics(old, new)
        assert d["quality_score_delta"] == -0.15
        assert d["completeness_delta"] == -0.2
        assert d["violations_appeared"] == ["completeness"]
        # and the reverse direction clears it
        (r,) = diff_quality_metrics(new, old)
        assert r["violations_cleared"] == ["completeness"]

    def test_quality_drift_flows_into_document_diff(self):
        from dbsurveyor_spark.survey.drift import (
            diff_schema_documents,
            drift_to_markdown,
        )

        old, new = _doc(), _doc()
        old["quality_metrics"] = self._metrics(score=0.95)
        new["quality_metrics"] = self._metrics(score=0.5)
        r = diff_schema_documents(old, new)
        assert r["has_changes"] and r["quality_drift"]
        assert "Quality drift" in drift_to_markdown(r)
        # sub-threshold moves are ignored
        new["quality_metrics"] = self._metrics(score=0.951)
        assert not diff_schema_documents(old, new)["has_changes"]


class TestMultiSchemaDocuments:
    def test_same_name_tables_in_different_schemas_diff_independently(self):
        """public.users vs app.users must not overwrite each other in the
        diff (ADVICE r4: name-only keys silently collapsed multi-schema
        JDBC documents)."""

        def doc(app_users_cols):
            return {
                "database_info": {"name": "db"},
                "tables": [
                    {
                        "name": "users",
                        "schema": "public",
                        "columns": [
                            {"name": "id", "data_type": "BIGINT",
                             "is_nullable": False},
                        ],
                        "row_count": 10,
                    },
                    {
                        "name": "users",
                        "schema": "app",
                        "columns": app_users_cols,
                        "row_count": 20,
                    },
                ],
            }

        old = doc([{"name": "id", "data_type": "BIGINT", "is_nullable": False}])
        new = doc(
            [
                {"name": "id", "data_type": "BIGINT", "is_nullable": False},
                {"name": "email", "data_type": "VARCHAR", "is_nullable": True},
            ]
        )
        r = diff_schema_documents(old, new)
        assert r["has_changes"]
        # exactly ONE table changed, and it's the schema-qualified app.users
        (tc,) = r["table_changes"]
        assert tc["table"] == "app.users"
        assert tc["columns_added"] == ["email"]
        # identical documents with two same-named tables stay clean
        assert not diff_schema_documents(new, copy.deepcopy(new))["has_changes"]
