from .validate import stream_violations, stream_partition_metrics

__all__ = ["stream_violations", "stream_partition_metrics"]
