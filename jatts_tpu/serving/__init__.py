from jatts_tpu.serving.export import (  # noqa: F401
    ServingBundle,
    build_infer_fn,
    export_bundle,
    load_bundle,
)
