from iodf_spark.plans.rowset import PostingSet, predicate_counts  # noqa: F401
