from greenmask_spark.pipeline.corpus import (  # noqa: F401
    CORPUS_STEPS,
    register_corpus_step,
    build_corpus_pipeline,
    corpus_funnel,
    run_corpus_pipeline,
)
from greenmask_spark.pipeline.presets import (  # noqa: F401
    PRESETS,
    c4_config,
    ccnet_config,
    fineweb_config,
    gopher_config,
)
