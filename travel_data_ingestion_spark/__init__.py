"""travel_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference medallion ETL pipeline
(cheami/travel-data-ingestion), built Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; Tungsten executes)
- metadata-driven file->bronze ingestion with an idempotency ledger
- silver cleaning/normalization transforms as lazy DataFrame chains
- gold analytical reports as DataFrame pipelines
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) as first-class modules

The package never copies reference code; reference file:line citations in
docstrings exist so semantics parity can be audited.
"""

__version__ = "0.1.0"
