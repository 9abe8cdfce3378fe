from informers_spark.streaming.ingest import (  # noqa: F401
    stream_extract_triples,
    stream_files,
    windowed_event_counts,
)
