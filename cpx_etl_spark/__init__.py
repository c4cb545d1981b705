"""cpx_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the reference ETL library
(jeroenvalk/cpx-etl, see SURVEY.md) as declarative DataFrame plans:
sources -> schema coercion -> path transforms -> validation -> routing
-> relational views -> sinks, plus large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB / multi-thousand-partition execution.
"""

from cpx_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
