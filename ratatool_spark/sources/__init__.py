from ratatool_spark.sources.io import (  # noqa: F401
    is_done,
    load_tables,
    read_table,
    sniff_format,
    write_table,
)
