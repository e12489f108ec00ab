"""data_engineering_nd_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-design of the query and data-processing
capabilities of the reference repo sl2902/Data-Engineering-ND
(an I94-immigration ETL + data-quality pipeline; see SURVEY.md).

The engine is a library of composable, tested operators expressed in the
PySpark DataFrame / SQL API so that Catalyst + Tungsten (AQE, whole-stage
codegen, predicate pushdown, partition pruning) do the physical planning.
Designed for 1000-executor / 100 TB scale; tested locally on the driver's
synthetic TPC-H-ish tables.

Modules
-------
- session:     SparkSession builder (AQE on, Arrow on, sane shuffle sizing)
- catalog:     table registry — name -> (path, format, schema, partition keys)
- functions:   scalar kernels (date conversion, text, hashing) as native
               Spark column expressions — no row-at-a-time Python UDFs
- operators:   relational + pipeline operators (dedup, similarity search,
               text analysis, multimodal plumbing, data quality)
- transforms:  the reference's 13 i94 table builders, re-expressed
- dictionary:  the SAS-labels text-dictionary parser (ref etl.py:378-420)
- analytics:   the star-schema query layer (the reference's README questions
               generalized to the driver's TPC-H-ish testdata)
- streaming:   Structured Streaming variants of the event pipeline
- pipeline:    batch runner: extract -> transform -> load -> quality-check
"""

__version__ = "0.1.0"
