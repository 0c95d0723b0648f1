"""files_kraken_spark — a PySpark-native analytics/ETL engine.

A from-scratch Spark engine with the query and data-processing
capabilities of the reference file-monitoring ETL system
(MrDunn0/files-kraken): directory-tree scanning, snapshot diffing,
regex-driven schema ("blueprint") extraction, entity assembly with
typed merge semantics, keyed-state upsert, and a micro-batch
streaming runtime — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) needed at 100 TB scale.

Everything is a DataFrame; all hot-path logic is Catalyst column
expressions (JVM-side, whole-stage-codegen-able). Python UDFs appear
only for user content parsers and are Arrow-vectorized.
"""

__version__ = "0.1.0"
