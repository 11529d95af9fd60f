"""spark-oeds — PySpark-native analytics engine with the query and
data-processing capabilities of NOWUM/open-energy-data-server.

Not a port: the reference is ~30 pandas crawlers + TimescaleDB/PostGIS
(see SURVEY.md). This package re-expresses that surface — and the
LLM-data-pipeline extensions (dedup, similarity, text analysis,
multimodal) — as idiomatic Spark DataFrame/SQL over partitioned
Parquet, designed for 100 TB scale.
"""

from open_energy_data_server_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
