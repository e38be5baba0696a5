"""Transformer operator library — import all families to populate the registry.

Parity target: the reference's 51 named transformers
(internal/db/postgres/transformers/, registry at utils/registry.go:23).
"""

from greenmask_spark.transformers.base import (  # noqa: F401
    DEFAULT_REGISTRY,
    BuildContext,
    Transformer,
    TransformerRegistry,
    keep_null_guard,
    register,
    resolve_param,
)

# Families register themselves on import.
from greenmask_spark.transformers import (  # noqa: F401,E402
    cmd,
    faker_like,
    json_ops,
    network,
    numeric,
    person,
    template,
    temporal,
    text,
)
from greenmask_spark.transformers.custom import (  # noqa: F401,E402
    load_custom_transformers,
    register_python_transformer,
)
