from iodf_spark.sources.tables import (  # noqa: F401
    NATURAL_KEYS,
    TABLES,
    load_table,
    with_row_id,
    with_row_id_scalable,
)
