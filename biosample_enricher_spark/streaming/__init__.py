from .validate import (
    read_violations,
    run_streaming_validation,
    stream_documents,
    streaming_duplicate_violations,
    streaming_violations,
    windowed_violation_counts,
)

__all__ = [
    "read_violations",
    "run_streaming_validation",
    "stream_documents",
    "streaming_duplicate_violations",
    "streaming_violations",
    "windowed_violation_counts",
]
