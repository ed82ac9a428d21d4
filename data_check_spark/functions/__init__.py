"""Column-expression helpers shared by the rule compiler and operators."""

from data_check_spark.functions.blank import (  # noqa: F401
    is_blank,
    is_present,
    norm_text,
)
