from ratatool_spark.streaming.events import (  # noqa: F401
    parse_props,
    read_event_stream,
    sessionize,
    windowed_event_stats,
    write_stream_to_parquet,
)
