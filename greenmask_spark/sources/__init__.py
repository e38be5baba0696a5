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
from greenmask_spark.sources.copy_format import (  # noqa: F401
    copy_decode,
    copy_encode,
    read_copy,
    write_copy,
)
from greenmask_spark.sources.restore import (  # noqa: F401
    ErrorExclusions,
    restore_copy,
    restore_insert,
)
