"""Vocoders: JAX HiFi-GAN generator + reference-checkpoint importer."""

from jatts_tpu.vocoder.vocoder import GriffinLimVocoder, Vocoder
