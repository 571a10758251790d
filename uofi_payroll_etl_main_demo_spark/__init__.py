"""PySpark-native analytics engine with the query/data-processing surface of
tayler-erbe/uofi-payroll-etl-main_demo (reference: /root/reference/
etl_payroll_pipeline_demo.py), rebuilt Spark-first.

The reference is an eager single-process pandas ETL script; this package
re-expresses its capability surface (multi-format ingestion, cleansing,
derivation, broadcast-dimension enrichment, validation, deduplication,
contract projection, multi-format output) as lazy, distributed PySpark
DataFrame plans, and extends it with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Modules
-------
- ``session``    SparkSession builder tuned for scale (AQE, Arrow, broadcast)
- ``functions``  column-expression builders (cleanse/text/vectors)
- ``operators``  relational operators (joins, dedup, aggregates, setops)
- ``io``         sources/sinks + file-inventory catalog
- ``validate``   schema-contract / range / format assertions
- ``pipelines``  the two reference pipeline compositions (PUA, CPA)
- ``ext``        LLM-data extension operators (minhash/simhash/ANN/text)
- ``streaming``  Structured Streaming equivalents over the events table
"""

__version__ = "0.1.0"
