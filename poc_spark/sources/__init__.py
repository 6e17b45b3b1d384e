from poc_spark.sources.catalog import load_table, load_tables  # noqa: F401
from poc_spark.sources.chat import read_chat_lines  # noqa: F401
