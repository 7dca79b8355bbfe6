from classification_problem_with_pyspark_spark.sources.catalog import SCHEMAS, TABLES, load, register_views

__all__ = ["SCHEMAS", "TABLES", "load", "register_views"]
