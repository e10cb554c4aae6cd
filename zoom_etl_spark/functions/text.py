"""Text / timestamp scalar functions.

Column-expression re-implementations of the reference's ad-hoc Python
string transforms (SURVEY.md §2.3): filesystem-name sanitization
(reference lambda/zoom_webhook/utils.py:82-88), path construction
(handler.py:70), delimiter-split extraction (extract.py:157-158), and
NULL-on-failure ISO timestamp parsing (src/db/load.py:52-69).
All pure built-ins → whole-stage codegen, no Python round trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters illegal in filesystem/object-store names (reference utils.py:83).
_ILLEGAL = '[/:*?"<>|\\\\]'


def sanitize_name(col: Column | str, max_len: int = 255,
                  empty_default: str = "unknown") -> Column:
    """regex-replace illegal chars with '_', truncate, default on empty/NULL."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.substring(F.regexp_replace(c, _ILLEGAL, "_"), 1, max_len)
    return F.coalesce(F.nullif(cleaned, F.lit("")), F.lit(empty_default))


def concat_path(*parts: Column | str) -> Column:
    """'/'-joined object-store key from column/literal parts (NULL-skipping
    concat_ws, matching f-string building in the reference handler)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("/", *cols)


def split_extract(col: Column | str, delim: str, idx: int) -> Column:
    """idx-th field (0-based) after splitting on a literal delimiter."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, delim).getItem(idx)


def parse_timestamp_ntz(col: Column | str, fmt: str | None = None) -> Column:
    """Parse a timestamp string, NULL on failure (the reference returns None
    on unparseable input — load.py:67-69 — so ``try_to_timestamp``, never
    the throwing ``to_timestamp`` under ANSI mode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
