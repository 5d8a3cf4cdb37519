"""video_stream_processor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Srivyaa/video-stream-processor`` (a single-threaded
micro-batch link→record ETL script, see ``/root/reference/video_processor.py``),
generalized to a full relational + streaming + LLM-data-pipeline operator
set per ``SURVEY.md §2`` and designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory + runtime-conf guard
- ``schemas``    explicit StructTypes for every table (incl. the 37-field
                 station record of the reference output)
- ``io``         table loaders (parquet test tables, link-file source)
- ``functions``  scalar derivations (reference parity) + text/vector funcs
- ``operators``  composite operators Spark lacks natively (as-of join,
                 dedup family, similarity search, top-k per group)
- ``sources``    enrichment-extractor interface (U1) with deterministic stub
- ``pipeline``   the reference station pipeline, batch + streaming twins
- ``streaming``  Structured Streaming jobs (windows, sessionization, dedup)
- ``plans``      the driver-contract query registry: every SURVEY §2
                 operator as a (builder, oracle-SQL) pair
"""

__version__ = "0.1.0"
