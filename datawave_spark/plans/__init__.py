"""Query planning: the user-facing query lifecycle."""

from datawave_spark.plans.checkpoint import CheckpointedQuery  # noqa: F401
from datawave_spark.plans.planner import QueryPlanner, QueryResult  # noqa: F401
