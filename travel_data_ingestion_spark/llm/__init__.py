"""Large-scale training-data operators.

Dedup / similarity / text-analysis live as registered queries in
``travel_data_ingestion_spark.queries.llm_*`` (they double as the
correctness surface); this subpackage holds the pieces that are APIs
rather than queries — the multimodal binary-column toolkit.
"""
