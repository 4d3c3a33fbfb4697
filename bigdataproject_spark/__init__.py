"""bigdataproject_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference system (Lin-cmy/bigdataProject — a Bilibili
danmaku mining stack: high-energy-moment detection, character relation
graphs, tag association mining; see SURVEY.md), generalized to arbitrary
relational / event / document / embedding tables and extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design rules (enforced throughout):
  - DataFrame/SQL only; no RDD escapes (reference's
    relation_graph/danmaku_analysis_cluster.py:139-151 RDD path is
    re-expressed with higher-order array functions).
  - Native ``pyspark.sql.functions`` expressions over Python UDFs; Arrow
    pandas_udf where Python is genuinely needed.
  - Explicit schemas (no inferSchema double-scans).
  - Broadcast small dimensions; pre-aggregate before wide shuffles; AQE on.
"""

from bigdataproject_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
