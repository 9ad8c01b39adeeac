from .stream_index import run_incremental_indexing, stream_documents  # noqa: F401
