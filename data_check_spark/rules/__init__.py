from data_check_spark.rules.spec import Rule, RuleCatalog, load_catalog  # noqa: F401
from data_check_spark.rules.compiler import (  # noqa: F401
    CompiledRule,
    apply_row_rules,
    compile_rule,
    compile_row_rules,
)
