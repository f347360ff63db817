"""Neural modules (flax.linen): attention, conformer, predictors, nets."""
