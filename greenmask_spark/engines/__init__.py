from greenmask_spark.engines.kernel import (  # noqa: F401
    HashEngine,
    RandomEngine,
    salted_hex,
    uniform_double,
    uniform_int,
)
