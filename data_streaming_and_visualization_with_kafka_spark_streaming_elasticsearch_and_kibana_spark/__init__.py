"""PySpark-native analytics engine with the query/data-processing surface of
the reference pipeline (ahmetutkubayri/Data-Streaming-and-Visualization-with-
Kafka-Spark-Streaming-Elasticsearch-and-Kibana).

Brand-new Spark-first design — DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the streaming half — NOT a port of the reference's
pandas + row-at-a-time scripts.

Layout:
    session     — SparkSession factory tuned for local[32] dev and cluster scale
    schemas     — canonical sensor-record schemas (reference's two consumer variants)
    functions/  — codecs (JSON/delimited wire formats), text analysis, vector math
    operators/  — batch operators: fusion, relational, dedup, similarity, multimodal
    sources/    — readers (csv/parquet/kafka) and sinks (kafka/es/parquet)
    streaming/  — Structured Streaming pipelines (windows, watermarks, upsert views)
    plans/      — explain/plan-inspection helpers
"""

from .session import get_spark

__all__ = ["get_spark"]
