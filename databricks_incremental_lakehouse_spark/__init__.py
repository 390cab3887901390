"""databricks_incremental_lakehouse_spark — a PySpark-native medallion lakehouse engine.

A from-scratch Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Gboluwagaf/databricks-incremental-lakehouse``
(Bronze -> Silver -> Gold medallion over TPC-H), built on the public PySpark
DataFrame / SQL / Structured Streaming APIs.

Layers
------
- ``bronze``   : audited, null-filtered, deduplicated ingests of the 8 source
  tables (reference ``src/extract/*``).
- ``silver``   : denormalized facts / profiled dims — ``order_details``,
  ``customer_orders`` (RFM), ``supplier_parts`` (reference ``src/refined/*``).
- ``gold``     : 4 analytical views (reference ``src/views/*``).
- ``quality``  : the 5-family data-quality suite (reference
  ``src/tests/data_quality_checks.py``), upgraded to actually assert.
- ``llmdata``  : LLM-training-data operators beyond the reference — dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  similarity search, text analysis, multimodal plumbing.
- ``streaming``: Structured Streaming incremental ingest + windowed aggregates
  (the "incremental" the reference names but never implements).

Every transform is a pure function ``f(spark, sf_dir, ...) -> DataFrame`` so
Catalyst sees one lazy plan per materialization, mirroring the reference's
temp-view-staged single-terminal-write discipline (SURVEY.md §3).
"""

__version__ = "0.1.0"
