"""jatts_tpu — a TPU-native Japanese TTS framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of unilight/jatts
(reference layout documented in SURVEY.md): five text->acoustic models
(FastSpeech2, Matcha-TTS, Matcha-TTS+MAS, mel-VITS, E2-TTS), a two-stage
neural-codec LM (VALL-E AR/NAR), jitted DSP feature extraction, HiFi-GAN
vocoding, a recipe-stage CLI surface, and an objective evaluation suite.

Design principles (TPU-first):
  * static shapes everywhere — bucketed padded batches, masked losses;
  * `jax.jit` train/inference steps over a `jax.sharding.Mesh` with
    `NamedSharding` (data parallel by default; model axes available);
  * sequential CPU hot spots of the reference (numba MAS, per-utterance
    repeat_interleave) re-designed as batched lattice ops / Pallas kernels;
  * functional modules (flax.linen) + optax + orbax.
"""

__version__ = "0.1.0"
