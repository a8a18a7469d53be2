"""Python-UDTF analyzer extension point (SURVEY.md §2.12).

The production analyzers are Column -> Column(array) EXPRESSIONS
(operators/index.py: identity / whitespace split) — JVM-codegen'd, the hot
path. But the reference's analyzer contract (IndexedDf.scala:19-33) is
"one value fans out to N index tokens", and a real corpus pipeline
eventually needs a tokenizer that cannot be expressed in SQL (a trained
BPE vocabulary, a language-specific segmenter, a library call). Spark 4's
Python UDTF is the extension point for exactly that: one (row_id, text)
row yields N (row_id, token) rows via a lateral join.

This is the SLOW path by design (per-row Python, the usual ~10-100x UDF
tax) — use it only when the tokenizer genuinely needs Python; the test
suite pins that its output on whitespace tokenization is IDENTICAL to the
expression analyzer's, so swapping a Python tokenizer in changes only
speed, never index semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def whitespace_udtf():
    """The whitespace tokenizer as a Python UDTF class (deferred creation —
    the decorator needs no session, but keeping construction inside a
    function keeps module import free of pyspark.sql.functions.udtf side
    effects)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="row_id bigint, token string")
    class _WhitespaceTokens:
        def eval(self, row_id, text):  # noqa: ANN001 - UDTF contract
            for t in (text or "").split():
                yield (row_id, t)

    return _WhitespaceTokens


def py_tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) -> (row_id, token) rows via the Python UDTF lateral join
    — the §2.12 UDTF surface. Equivalent to
    ``explode(text_analyzer(text))`` for whitespace tokens (pinned by
    test); slot a custom Python tokenizer into the UDTF body for the cases
    SQL can't express."""
    u = whitespace_udtf()
    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).lateralJoin(
        u(F.col("_id").outer(), F.col("_text").outer())
    ).select("row_id", "token")
