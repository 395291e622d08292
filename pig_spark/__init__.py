"""pig_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Pig (reference: apache/pig),
re-expressed Spark-first: every Pig operator is a lazy DataFrame
transformation planned by Catalyst, not a port of Pig's MR/Tez
execution machinery.

Entry points:
    from pig_spark import Relation, get_spark
    rel = Relation.load(spark, path, "parquet")
    rel.filter(...).group_by(...).agg(...).store(out)
"""

from .dsl import GroupedRelation, Relation
from .session import get_spark

__all__ = ["Relation", "GroupedRelation", "get_spark"]
__version__ = "0.1.0"
