"""Unicode text normalization for training-data cleaning (P33).

Two composable steps over a text column:

* **Canonical form** (NFC by default, NFKC for compatibility folding) via
  an Arrow-batched pandas UDF around stdlib ``unicodedata`` — the only
  part of the pipeline that needs Python, and it runs on the *non-ASCII
  subset only*: inside the kernel a vectorized ASCII pre-check masks out
  rows that normalization cannot change (ASCII is closed under every
  normalization form), so a web-scale, overwhelmingly-ASCII corpus pays
  pandas string-copy cost instead of per-row ``unicodedata.normalize``
  calls. The UDF itself is one projection in the same scan that feeds the
  next stage — no shuffle.
* **Control-character strip** entirely JVM-side (``regexp_replace``) with
  a pattern written in the Java≡RE2 common dialect so the DuckDB oracle
  evaluates the SAME pattern bytes (see ``tests/test_normalize.py`` and
  the ``normalize_docs`` entry).

The reference engine lowercases and truncates fields but never repairs
unicode (Indexer.java builds terms from raw DB text); this operator is
part of the training-data pipeline family (SURVEY.md §2.8), where mixed
NFC/NFD sources would otherwise split token statistics for visually
identical strings.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# C0 controls minus \t \n \r, plus DEL. Written with \xhh escapes — valid
# and identical in Java regex (Spark) and RE2 (DuckDB oracle), so both
# engines compile the same pattern bytes.
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

def _norm_udf(form: str):
    @F.pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        # ASCII rows can't change under any normalization form — skip the
        # per-row python call for them (the common case on web corpora).
        mask = s.str.contains("[^\x00-\x7f]", regex=True, na=False)
        if not mask.any():
            return s
        out = s.copy()
        out[mask] = s[mask].map(lambda x: unicodedata.normalize(form, x))
        return out

    return norm


def normalize_expr(col: Column, form: str = "NFC",
                   strip_control: bool = True) -> Column:
    """Normalized-text Column: canonical form then control strip.

    Order matters and is pinned by the oracle: normalization first (so a
    decomposed char never straddles a stripped control byte), then the
    JVM-side regexp strip.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = _norm_udf(form)(col)
    if strip_control:
        out = F.regexp_replace(out, CONTROL_CLASS, "")
    return out


def normalize_text(df: DataFrame, text_col: str = "content",
                   out_col: str | None = None, form: str = "NFC",
                   strip_control: bool = True,
                   with_changed: bool = False) -> DataFrame:
    """Add (or overwrite) the normalized text column.

    ``with_changed=True`` also adds ``<out>_changed`` (0/1 int) — handy
    for auditing how much of a corpus a normalization pass touches without
    a second diff job.
    """
    out_col = out_col or text_col
    norm = normalize_expr(F.col(text_col), form=form,
                          strip_control=strip_control)
    # materialize into a temp column first so the changed-flag comparison
    # sees the ORIGINAL text even when out_col overwrites text_col, and the
    # pandas UDF is evaluated exactly once in the plan
    tmp = out_col if out_col != text_col else f"__{text_col}_normalized"
    df = df.withColumn(tmp, norm)
    if with_changed:
        df = df.withColumn(
            f"{out_col}_changed",
            (~F.col(tmp).eqNullSafe(F.col(text_col))).cast("int"))
    if tmp != out_col:
        df = df.withColumn(out_col, F.col(tmp)).drop(tmp)
    return df


def duck_normalize_sql(expr: str, form: str = "NFC",
                       strip_control: bool = True) -> str:
    """DuckDB SQL string computing the same normalization as
    :func:`normalize_expr` over the SQL expression ``expr`` (oracle side).
    DuckDB only ships nfc_normalize, so oracle pairing is NFC-only; other
    forms are covered by the pure-python parity tests instead."""
    if form != "NFC":
        raise ValueError("DuckDB oracle supports NFC only")
    out = f"nfc_normalize({expr})"
    if strip_control:
        out = f"regexp_replace({out}, '{CONTROL_CLASS}', '', 'g')"
    return out
