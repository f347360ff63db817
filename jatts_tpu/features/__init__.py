"""Feature extractors (mirror of reference jatts/modules/feature_extract/)."""

from jatts_tpu.features.extractors import Dio, Energy, LogMelExtractor

FEATURE_REGISTRY = {
    "mel": LogMelExtractor,
    "dio": Dio,
    "energy": Energy,
}
