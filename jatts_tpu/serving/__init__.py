from jatts_tpu.serving.export import (  # noqa: F401
    ServingBundle,
    ValleServingBundle,
    build_infer_fn,
    build_valle_fn,
    export_bundle,
    export_valle_bundle,
    load_bundle,
)
