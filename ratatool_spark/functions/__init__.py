from ratatool_spark.functions.hashing import (  # noqa: F401
    bound01,
    dice,
    hash_cols,
    portable_hash64,
    serialize_for_hash,
    xxhash_cols,
)
