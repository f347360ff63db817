"""Masked loss functions (registry mirrors reference jatts/losses/)."""

from jatts_tpu.losses.basic import (
    DurationPredictorLoss,
    EnergyLoss,
    L1Loss,
    MelLoss,
    PitchLoss,
    masked_l1,
    masked_mse,
)
from jatts_tpu.losses.align import BinLoss, ForwardSumLoss
from jatts_tpu.losses.flow_matching import CFMLoss, EncoderPriorLoss
from jatts_tpu.losses.kl import KLDivergenceLoss, KLDivergenceLossWithoutFlow

LOSS_REGISTRY = {
    "MelLoss": MelLoss,
    "L1Loss": L1Loss,
    "DurationPredictorLoss": DurationPredictorLoss,
    "PitchLoss": PitchLoss,
    "EnergyLoss": EnergyLoss,
    "ForwardSumLoss": ForwardSumLoss,
    "BinLoss": BinLoss,
    "CFMLoss": CFMLoss,
    "EncoderPriorLoss": EncoderPriorLoss,
    "KLDivergenceLoss": KLDivergenceLoss,
    "KLDivergenceLossWithoutFlow": KLDivergenceLossWithoutFlow,
}
