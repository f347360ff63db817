"""Model zoo behind a string registry (mirrors reference
jatts/models/__init__.py + getattr dispatch in jatts/bin/tts_train.py:276-279)."""

from jatts_tpu.models.fastspeech2 import FastSpeech2

MODEL_REGISTRY = {
    "FastSpeech2": FastSpeech2,
}


def _register_optional():
    """Models appended here as they land; import errors surface lazily."""
    from jatts_tpu.models.matchatts import MatchaTTS  # noqa: PLC0415

    MODEL_REGISTRY["MatchaTTS"] = MatchaTTS
    from jatts_tpu.models.matchatts_mas import MatchaTTS_MAS  # noqa: PLC0415

    MODEL_REGISTRY["MatchaTTS_MAS"] = MatchaTTS_MAS
    from jatts_tpu.models.vits import VITS  # noqa: PLC0415

    MODEL_REGISTRY["VITS"] = VITS
    from jatts_tpu.models.e2tts import E2TTS  # noqa: PLC0415

    MODEL_REGISTRY["E2TTS"] = E2TTS
    from jatts_tpu.models.valle import VALLEAR, VALLENAR  # noqa: PLC0415

    MODEL_REGISTRY["VALLEAR"] = VALLEAR
    MODEL_REGISTRY["VALLENAR"] = VALLENAR


def get_model(name: str):
    if name not in MODEL_REGISTRY:
        _register_optional()
    return MODEL_REGISTRY[name]
