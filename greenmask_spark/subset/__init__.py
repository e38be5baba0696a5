from greenmask_spark.subset.graph import FKGraph, Reference, find_scc  # noqa: F401
from greenmask_spark.subset.planner import SubsetPlanner  # noqa: F401
