"""Validation gates — the reference validation job, distributed-correct.

Reference semantics and the rewrites (SURVEY §4.3):

- Null gate: reference loops ``filter(isnull|isnan).count()`` per column
  (scripts/validation.py:83-91) — k full scans for k columns.  Here: ONE
  conditional-sum aggregation pass over all gated columns.
- Referential integrity: reference does ``distinct().collect()`` then
  ``~isin(list)`` (scripts/validation.py:100-116) — materializes every
  key on the driver.  Here: ``left_anti`` join, fully distributed, and
  the violating rows come back as a DataFrame (not a .show()).
- Schema gate: required-header subset check
  (reference lambda/s3_validation.py:128-135).
- Error taxonomy preserved: NULL_VALIDATION_ERROR / REFERENTIAL_ERROR /
  UNKNOWN (reference scripts/validation.py:45-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_VALIDATION_ERROR = "NULL_VALIDATION_ERROR"
REFERENTIAL_ERROR = "REFERENTIAL_ERROR"
SCHEMA_ERROR = "SCHEMA_ERROR"
UNKNOWN = "UNKNOWN"


class DataValidationError(Exception):
    """Typed validation failure (reference scripts/validation.py:45-48)."""

    def __init__(self, error_type: str, message: str):
        super().__init__(message)
        self.error_type = error_type
        self.message = message


def schema_gate(df: DataFrame, required: set[str]) -> set[str]:
    """Missing-column set; empty means pass
    (reference lambda/s3_validation.py:128-135)."""
    return required - set(df.columns)


def null_violation_counts(df: DataFrame, columns: list[str]) -> dict[str, int]:
    """Null counts for all gated columns in ONE scan.

    Replaces the reference's per-column filter+count loop
    (scripts/validation.py:83-91): a single partial+final agg with a
    conditional sum per column — one job, one pass, map-side combined.
    """
    if not columns:
        return {}
    row = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in columns
        ]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in columns}


def ri_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent — distributed anti-join.

    Replaces reference scripts/validation.py:100-116 (distinct → collect
    → isin).  At scale the anti-join is a shuffle or broadcast join that
    never touches the driver; returns the violating rows for quarantine.
    """
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(parent_keys, on=child_key, how="left_anti")


def validate_entity(
    df: DataFrame,
    required: set[str],
    non_null_cols: list[str],
) -> DataFrame:
    """Run schema + null gates; raise typed errors; return df untouched.

    Mirrors the reference validation flow (scripts/validation.py:145-219)
    minus its driver round-trips.
    """
    missing = schema_gate(df, required)
    if missing:
        raise DataValidationError(
            SCHEMA_ERROR, f"missing required columns: {sorted(missing)}"
        )
    nulls = {c: n for c, n in null_violation_counts(df, non_null_cols).items() if n}
    if nulls:
        raise DataValidationError(
            NULL_VALIDATION_ERROR, f"null values in required columns: {nulls}"
        )
    return df
