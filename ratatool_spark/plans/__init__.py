from ratatool_spark.plans.schema import (  # noqa: F401
    assert_can_read,
    get_nested_field,
    merge_schemas,
)
