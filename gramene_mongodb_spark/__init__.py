"""gramene_mongodb_spark — a PySpark-native batch analytics engine.

Re-expresses the query/data-processing capabilities of the reference ETL
system (``warelab/gramene-mongodb``, surveyed in ``SURVEY.md``) as idiomatic
Spark DataFrame operators, plus LLM-data-pipeline extensions (dedup,
similarity search, text analysis) designed for 100 TB scale.

Layout:
    session        SparkSession factory (tuned for oracle-comparable output)
    io             table loaders / sinks / reject channel
    operators/     relational + algorithmic operators (SURVEY.md §2 ids)
    sources/       OBO / XML / REST custom sources
    catalog        the (queries, oracle_sql) registry consumed by the driver
    streaming/     Structured Streaming surface over the events table
"""

from gramene_mongodb_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
