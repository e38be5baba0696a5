from greenmask_spark.plan.planner import (  # noqa: F401
    BoundTransformer,
    TablePlan,
    apply_plan,
    apply_plans,
    build_plan,
)
from greenmask_spark.plan.inheritance import (  # noqa: F401
    expand_partitions,
    expand_references,
)
