from greenmask_spark.sources.manifest import (  # noqa: F401
    Manifest,
    TableMeta,
    build_manifest,
)
from greenmask_spark.sources.io import (  # noqa: F401
    read_table,
    read_jdbc_table,
    write_dump,
    write_jdbc_table,
)
