from planar_spark.graph.tables import GraphTables
from planar_spark.graph.superstep import SuperstepEngine, SuperstepResult

__all__ = ["GraphTables", "SuperstepEngine", "SuperstepResult"]
