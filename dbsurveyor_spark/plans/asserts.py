"""Physical-plan assertions: keep the engine honest about scale.

These run in tests (SURVEY.md §5.3): a query that silently loses predicate
pushdown, broadcasts nothing it should, or drops into row-at-a-time Python
would still pass value checks at sf0.01 — and then die at 100 TB. Asserting
on `explain("formatted")` output pins the *plan shape*, not just results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert the parquet scan carries PushedFilters mentioning each needle
    (column name or literal fragment)."""
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, f"no PushedFilters in plan:\n{plan}"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for needle in needles:
        assert needle in joined, f"filter on {needle!r} not pushed: {joined}\n\n{plan}"


def assert_read_schema_only(df: DataFrame, table_path_fragment: str, allowed: set[str]) -> None:
    """Assert the scan of the given table reads ONLY `allowed` columns
    (column pruning reached the reader)."""
    plan = formatted_plan(df)
    # Formatted explain renders each operator as a "(N) Scan parquet" section
    # (blank-line separated) holding Location + ReadSchema lines.
    for section in plan.split("\n\n"):
        if "Scan parquet" not in section or "ReadSchema" not in section:
            continue
        if table_path_fragment not in section:
            continue
        schema_line = next(ln for ln in section.splitlines() if "ReadSchema" in ln)
        # ReadSchema: struct<a:bigint,b:string,...>
        inner = schema_line.split("struct<", 1)[1].rsplit(">", 1)[0]
        cols = {c.split(":")[0] for c in _split_top(inner) if c}
        extra = cols - allowed
        assert not extra, f"scan of {table_path_fragment} reads extra columns {extra}: {schema_line}"
        return
    raise AssertionError(f"no ReadSchema found for {table_path_fragment}:\n{plan}")


def _split_top(s: str) -> list[str]:
    """Split struct field list on commas not inside nested <>."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{plan}"


def assert_no_python_eval(df: DataFrame) -> None:
    """Hot paths must stay JVM-side: no BatchEvalPython (row-at-a-time UDF)
    and no ArrowEvalPython unless the operator is explicitly a Pandas-UDF
    design (multimodal)."""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF in plan:\n{plan}"
    assert "ArrowEvalPython" not in plan, f"unexpected Pandas UDF in plan:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame | None, rebuild=None) -> None:
    """AQE defers codegen wrapping to runtime stages, so inspect the static
    plan with AQE off. Pass `rebuild` (a zero-arg fn returning the DataFrame)
    so the plan is COMPILED under the non-adaptive config; plain `df` is used
    when its plan was already built that way."""
    from pyspark.sql import SparkSession

    spark = df.sparkSession if df is not None else SparkSession.getActiveSession()
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # harden_session (called inside every registry query) re-enables AQE;
    # this flag tells it we're inspecting a static plan.
    spark.conf.set("spark.dbsurveyor.planInspection", "true")
    try:
        target = rebuild() if rebuild is not None else df
        plan = formatted_plan(target)
        # formatted mode annotates codegen-fused operators with
        # "[codegen id : N]" (the WholeStageCodegen span membership).
        assert "codegen id" in plan, f"no WholeStageCodegen span:\n{plan}"
    finally:
        spark.conf.set("spark.dbsurveyor.planInspection", "false")
        spark.conf.set("spark.sql.adaptive.enabled", prev)
