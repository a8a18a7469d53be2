"""iodf_spark — a PySpark-native analytics engine with the capabilities of
futurice/iodf (immutable columnar dataframes + inverted bitmap indexes +
frequency/co-occurrence statistics + bitmap KNN), re-expressed Spark-first.

Reference semantics are documented in SURVEY.md with file:line citations into
the reference repo; this package is a from-scratch implementation on the
DataFrame/SQL API (Catalyst + Tungsten pick the physical plan).

Layout:
    session.py    - tuned SparkSession builder
    sources/      - table loading, row_id assignment, segment model (S1-S9)
    plans/        - RowSet predicate/bitmap algebra (B1-B8)
    operators/    - index build/probe (I1-I6), costats (A2-A3), knn (M1-M4),
                    dedup, similarity search, text analysis, multimodal
    functions/    - closed-form math (CoStats), reusable column expressions
    streaming/    - Structured Streaming ingest/windowed aggs (extension)
"""

__version__ = "0.1.0"

from iodf_spark.session import get_spark  # noqa: F401
