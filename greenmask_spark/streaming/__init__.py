from greenmask_spark.streaming.pipeline import (  # noqa: F401
    dedup_stream,
    masked_stream,
    quota_stream,
    sessionize_batch,
    sessionize_stream,
    stream_events_from_dir,
    windowed_event_counts,
)
