from planar_spark.ingest.extract import extract_links_udf, extract_text_udf
from planar_spark.ingest.build import build_graph_tables, dictionary_encode

__all__ = [
    "extract_links_udf",
    "extract_text_udf",
    "dictionary_encode",
    "build_graph_tables",
]
