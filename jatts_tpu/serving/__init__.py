from jatts_tpu.serving.export import (  # noqa: F401
    E2ttsServingBundle,
    ServingBundle,
    ValleServingBundle,
    build_e2tts_fn,
    build_infer_fn,
    build_valle_fn,
    export_bundle,
    export_e2tts_bundle,
    export_valle_bundle,
    load_bundle,
)
