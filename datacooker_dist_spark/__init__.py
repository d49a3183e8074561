"""datacooker_dist_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference `PastorGL/datacooker-dist` (an Apache-Spark distributed copy
utility), re-expressed Spark-first on the DataFrame/Catalyst stack, and
extended with a full relational operator set plus LLM-training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout (see SURVEY.md §7):
- ``model``      DataStream/StreamType/Partitioning data model (§1)
- ``registry``   verb → adapter registry (reference A21)
- ``sources``    storage adapters: hadoop fs (csv/parquet/text), jdbc (A1-A19)
- ``plans``      JSON copy-config model + runner + CLI (A20, A22, §3.1)
- ``operators``  relational / time-series / dedup / similarity / text /
                 multimodal operator library (§2.B)
- ``functions``  scalar expression helpers shared by operators
- ``streaming``  structured-streaming pipelines with watermark/late-data
"""

__version__ = "0.1.0"

from . import sources  # noqa: E402,F401  (imports register storage adapters)
