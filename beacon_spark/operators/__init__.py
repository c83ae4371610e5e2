from beacon_spark.operators.summarize import summarize
from beacon_spark.schema import union_all_by_name, union_by_name

__all__ = ["summarize", "union_all_by_name", "union_by_name"]
