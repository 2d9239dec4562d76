"""Per-task typed result tables (declared-projection results).

The reference lazily creates ONE SQL TABLE PER TASK whose columns are the
rule's declared ItemFields plus URL + Time, then batch-inserts item rows
into it (storage/sqlstorage/sqlstorage.go:43-61 table create from
ItemFields, sqldb/sqldb.go:68-90 DDL; every column is VARCHAR). The engine
here lands all items in one map-typed ``results`` table (schemas.RESULTS);
this module is the declared-projection half: it turns that map payload
into a fixed StructType per (task, rule), exactly the reference's table
shape with the deterministic ``round`` stamp standing in for wall-clock
Time (the engine-wide determinism deviation, BASELINE.md).

Scale notes:
- the projection is a narrow ``element_at`` per declared field over an
  already-partitioned scan — no shuffle, whole-stage codegen;
- fields absent from a row's map project as NULL (the reference inserts
  whatever the parser put in the cell; missing keys become empty values);
  undeclared map keys are dropped, as the fixed DDL drops them;
- table-per-task fan-out writes are independent jobs over one shared scan,
  so a production writer runs them concurrently (the engine's write pool
  does exactly this for its per-round deltas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textcore import Rule


def typed_schema(rule: Rule) -> list[str]:
    """Column order of the task's typed table: declared fields, then the
    envelope columns (URL + Time analog) — sqldb/sqldb.go:68-90 appends
    URL/Time after the ItemFields in the CREATE TABLE.

    Rules with no declared ItemFields (e.g. the doubangroup URL-emitter,
    whose item IS the request URL) get an envelope-only table, exactly the
    reference's getFields() on an empty fields list
    (storage/sqlstorage/sqlstorage.go:75-94). A declared field named like
    an envelope column would break the reference's CREATE TABLE the same
    way; we drop it from the projection (the envelope column wins)."""
    fields = [f for f in rule.item_fields if f not in ("url", "round")]
    return fields + ["url", "round"]


def typed_results(results: DataFrame, rule: Rule) -> DataFrame:
    """Project the map-typed ``results`` rows of one (task, rule) into its
    declared typed table. ``results`` is RESULTS-shaped (schemas.RESULTS).
    """
    cols = [
        F.element_at(F.col("data"), f).alias(f)
        for f in typed_schema(rule)[:-2]
    ]
    return (
        results.filter(
            (F.col("task") == rule.task) & (F.col("rule") == rule.rule)
        )
        .select(*cols, "url", "round")
    )


def typed_results_all(
    results: DataFrame, rules: list[Rule]
) -> dict[tuple[str, str], DataFrame]:
    """One typed frame per item-emitting rule (lazy-create analog: rules
    that never emitted an item produce no table — the dict simply has an
    empty frame the caller may skip writing, exactly the reference's
    create-on-first-flush)."""
    return {
        (r.task, r.rule): typed_results(results, r)
        for r in rules
        if r.item_fields or r.emit_url_as
    }
