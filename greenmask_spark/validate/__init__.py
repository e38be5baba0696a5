from greenmask_spark.validate.diff import diff_report, schema_diff  # noqa: F401
from greenmask_spark.validate.warnings import (  # noqa: F401
    ValidationWarning,
    has_unresolved,
    is_fatal,
    validate_plan,
    validate_plans,
)
