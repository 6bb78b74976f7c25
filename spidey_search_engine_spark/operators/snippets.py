"""F11 snippet builder (QueryResultsFetcher.java:23-24,146-169).

Reference semantics: for a result doc, take the first ``max_snippets=5``
match positions of any query term, cut a ``±snippet_size/2`` (=±8) token
window from the doc's RAW (unstemmed, lowercased-at-index) token stream
around each, and join the windows with ``"... "``.

The reference reads txt_docs/<id>.txt per result row from local disk; here
the raw token stream is recomputed from `content` for just the ≤k result
docs (a broadcast-semi-joined scan — at 10^12 docs the k-row join prunes to
a handful of row groups when the source table is doc_id-sorted), and the
window/join is pure column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import spark_udfs

MAX_SNIPPETS = 5
SNIPPET_SIZE = 16  # window = pos-8 .. pos+8 (reference ±snippetSize/2)


def with_snippets(results: DataFrame, source_docs: DataFrame,
                  query_terms: list[str], profile: str = "code_raw",
                  id_col: str = "doc_id") -> DataFrame:
    """results: small DF with `doc_id`; source_docs: (doc_id, content).
    Adds a `snippet` string column."""
    udfs = spark_udfs()
    toks = udfs[profile](F.col("content"))
    docs = (source_docs.join(results.select(id_col), id_col, "left_semi")
            .select(id_col, toks.alias("_t")))
    # match positions: raw tokens lowercased == stemmed query term prefix is
    # NOT the reference rule — the reference matches the *unstemmed* snippet
    # token against the *stemmed* query word by prefix (startsWith,
    # QueryResultsFetcher.java:157). Reproduce that.
    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    matches = F.filter(
        F.transform(F.col("_t"),
                    lambda tok, i: F.when(
                        F.exists(terms_arr,
                                 lambda q: F.lower(tok).startswith(q)), i)
                    .otherwise(F.lit(-1))),
        lambda x: x >= 0)
    half = SNIPPET_SIZE // 2
    windows = F.transform(
        F.slice(matches, 1, MAX_SNIPPETS),
        lambda pos: F.array_join(
            F.slice(F.col("_t"),
                    F.greatest(F.lit(1), pos + 1 - half),
                    F.lit(SNIPPET_SIZE)), " "))
    snip = docs.select(id_col, F.array_join(windows, "... ").alias("snippet"))
    return results.join(snip, id_col, "left")
