"""Rejection audit trail for cleaning pipelines (P35).

A production training-data pipeline must answer "why did this document
disappear?" without re-running the whole chain. Each filter stage of the
``clean`` pipeline is a set-shrinking transformation; the audit trail is
the per-stage difference of the surviving id sets, labeled with the FIRST
stage that rejected each document (a doc dropped by the quality gate never
reaches exact dedup, so stages never double-report).

Scale shape: each log is one left-anti join on the id column — an
AQE-planned hash join between two id projections of lineages the caller
has already persisted at stage boundaries (the ``clean --audit`` CLI does
exactly that), so no stage recomputes its predecessors. The log itself is
(id, stage) — two narrow columns, written once at the end.

The reference engine has no analog (its crawler logs to stdout,
Crawler.java); this belongs to the training-data family (SURVEY.md §2.8).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_log(before: DataFrame, after: DataFrame, stage: str,
             id_col: str = "doc_id") -> DataFrame:
    """(id_col, stage) — rows of ``before`` that ``after`` no longer has.

    ``stage`` is attached as a literal so logs from successive stages can
    be unioned into one trail. Only the id columns are compared: stages
    that rewrite text but keep the document (redaction, normalization,
    span excision) produce an empty log by construction.
    """
    return (before.select(id_col)
            .join(after.select(id_col), id_col, "left_anti")
            .withColumn("stage", F.lit(stage)))


def union_logs(logs: "list[DataFrame]") -> DataFrame | None:
    """One (id, stage) trail from per-stage logs; None when no stage ran."""
    if not logs:
        return None
    return reduce(lambda a, b: a.unionByName(b), logs)
