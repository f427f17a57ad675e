from .pipeline import classify_stream, streaming_kind_counts  # noqa: F401
