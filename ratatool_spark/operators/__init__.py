from ratatool_spark.operators.sampler import sample, head_sample, reservoir_sample  # noqa: F401
