from cpx_etl_spark.sources.registry import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]
