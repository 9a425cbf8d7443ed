from .validate import (
    run_streaming_validation,
    stream_documents,
    streaming_violations,
    windowed_violation_counts,
)

__all__ = [
    "run_streaming_validation",
    "stream_documents",
    "streaming_violations",
    "windowed_violation_counts",
]
