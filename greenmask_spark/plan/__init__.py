from greenmask_spark.plan.planner import (  # noqa: F401
    BoundTransformer,
    TablePlan,
    apply_plan,
    build_plan,
)
