"""poc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the NetXplore-System/POC reference
(conversation-network analysis), re-expressed Spark-first, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal plumbing, text analysis) the 100 TB north star requires.

Layout (SURVEY.md §7.0):
  session.py          SparkSession factory (AQE, Arrow, CORRECTED parser)
  schemas.py          normative StructTypes (SURVEY.md §1.4)
  sources/            chat text ingestion, parquet table catalog, sinks
  functions/          scalar expression builders (parse/normalize/quality)
  operators/          network graph, text analysis, dedup, similarity, dims
  plans/              plan inspection / scale helpers
  streaming/          Structured Streaming ingestion + session windows
"""

__version__ = "0.1.0"
