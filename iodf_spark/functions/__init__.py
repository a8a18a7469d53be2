from iodf_spark.functions.costats_math import (  # noqa: F401
    costats_py,
    costats_sql_exprs,
    costats_columns,
)
