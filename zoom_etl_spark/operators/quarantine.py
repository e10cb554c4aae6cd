"""Validation routing: valid/quarantine DataFrame splitting with a typed
reason column — the engine form of the reference's error taxonomy +
categorized notification flow (reference src/errors/error_types.py:4-11,
src/errors/error_handler.py:107-147, webhook validation
lambda/zoom_webhook/handler.py:46-52,113-118).

Instead of raising per record, every rule failure routes the row to a
quarantine DataFrame tagged with the first failed rule's reason (the
reference's match/case picks one category the same way). Both outputs
come from one scan: the reason column is computed once; valid = reason
IS NULL, quarantine = the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "_quarantine_reason"


def validate_split(df: DataFrame,
                   rules: list[tuple[str, Column]]) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined). ``rules`` is an ordered list of
    (reason, predicate-that-must-hold); the FIRST violated rule names the
    reason, mirroring the reference's match/case ordering. Quarantined
    rows keep all columns plus ``_quarantine_reason``.
    """
    reason: Column = F.lit(None).cast("string")
    # build first-match-wins from the last rule backwards
    for name, must_hold in reversed(rules):
        reason = F.when(~F.coalesce(must_hold, F.lit(False)), F.lit(name)).otherwise(reason)
    tagged = df.withColumn(REASON_COL, reason)
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    quarantined = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, quarantined


def required_fields_rules(*fields: str) -> list[tuple[str, Column]]:
    """The webhook handler's required-field validation as rules
    (handler.py:46-52): one MISSING_<FIELD> reason per field."""
    return [(f"MISSING_{f.upper()}", F.col(f).isNotNull()) for f in fields]
