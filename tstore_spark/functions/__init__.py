from tstore_spark.functions.timeparts import (
    PARTITION_COMPONENTS,
    add_partitioning_columns,
    check_partitioning,
    partition_columns,
)
from tstore_spark.functions.filters import time_range_filter, check_time, check_start_end_time
from tstore_spark.functions.urls import domain_of

__all__ = [
    "PARTITION_COMPONENTS",
    "add_partitioning_columns",
    "check_partitioning",
    "partition_columns",
    "time_range_filter",
    "check_time",
    "check_start_end_time",
    "domain_of",
]
