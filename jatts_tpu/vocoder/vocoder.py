"""Vocoder wrapper (reference jatts/vocoder/vocoder.py:16-67).

decode(): denormalize mel by the acoustic model's stats -> renormalize by the
vocoder's training stats -> HiFi-GAN generator -> waveform. The generator call
is jitted per (T,) bucket; RTF is logged like the reference.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from jatts_tpu.utils.io import read_hdf5
from jatts_tpu.vocoder.convert import hifigan_torch_to_flax, load_torch_state_dict
from jatts_tpu.vocoder.hifigan import HiFiGANGenerator


class Vocoder:
    def __init__(
        self,
        checkpoint: str,
        config: str | Dict[str, Any],
        stats: Optional[str] = None,
        pad_multiple: int = 64,
    ):
        if isinstance(config, str):
            with open(config) as f:
                config = yaml.load(f, Loader=yaml.SafeLoader)
        self.config = config
        gp = dict(config.get("generator_params", {}))
        self.model = HiFiGANGenerator(
            in_channels=gp.get("in_channels", config.get("num_mels", 80)),
            out_channels=gp.get("out_channels", 1),
            channels=gp.get("channels", 512),
            kernel_size=gp.get("kernel_size", 7),
            upsample_scales=tuple(gp.get("upsample_scales", (5, 5, 4, 3))),
            upsample_kernel_sizes=tuple(
                gp.get("upsample_kernel_sizes", [2 * s for s in gp.get("upsample_scales", (5, 5, 4, 3))])
            ),
            resblock_kernel_sizes=tuple(gp.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilations=tuple(
                tuple(d) for d in gp.get("resblock_dilations", ((1, 3, 5),) * 3)
            ),
            use_additional_convs=gp.get("use_additional_convs", True),
        )
        self.variables = hifigan_torch_to_flax(load_torch_state_dict(checkpoint))
        self.hop_size = int(np.prod(self.model.upsample_scales))
        self.sampling_rate = int(config.get("sampling_rate", 24000))
        self.mean = self.scale = None
        if stats is not None:
            self.mean = np.asarray(read_hdf5(stats, "mean"))
            self.scale = np.asarray(read_hdf5(stats, "scale"))
        self.pad_multiple = pad_multiple

        @functools.partial(jax.jit, static_argnames=())
        def _infer(variables, mel):
            return self.model.apply(variables, mel)[..., 0]

        self._infer = _infer

    def decode(
        self,
        mel: np.ndarray,
        model_mean: Optional[np.ndarray] = None,
        model_scale: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """mel: [T, num_mels] normalized by the acoustic model stats."""
        start = time.time()
        if model_mean is not None:
            mel = mel * model_scale + model_mean  # denorm by model stats
        if self.mean is not None:
            mel = (mel - self.mean) / self.scale  # renorm by vocoder stats
        t = mel.shape[0]
        pad_t = -(-t // self.pad_multiple) * self.pad_multiple
        mel_p = np.pad(mel.astype(np.float32), ((0, pad_t - t), (0, 0)))
        wav = np.asarray(self._infer(self.variables, jnp.asarray(mel_p[None])))[0]
        wav = wav[: t * self.hop_size]
        rtf = (time.time() - start) / (len(wav) / self.sampling_rate)
        logging.debug(f"vocoder RTF = {rtf:.6f}")
        return wav


class GriffinLimVocoder:
    """Weights-free mel inversion with the Vocoder.decode interface.

    The reference cannot decode without a parallel_wavegan checkpoint
    (jatts/vocoder/vocoder.py:16-44); this fallback inverts log-mels via the
    jitted Griffin-Lim in ops/dsp.py so tts_decode always produces audio
    (``--vocoder griffin_lim`` or when no vocoder checkpoint is configured).
    Expects mels normalized by the acoustic model stats (like Vocoder).
    """

    def __init__(self, config: Dict[str, Any], n_iter: int = 32,
                 pad_multiple: int = 64):
        self.config = config
        self.sampling_rate = int(config.get("sampling_rate", 24000))
        self.fft_size = int(config.get("fft_size", 2048))
        self.hop_size = int(config.get("hop_size", 300))
        self.num_mels = int(config.get("num_mels", 80))
        self.fmin = config.get("fmin", 80)
        self.fmax = config.get("fmax", 7600)
        self.n_iter = n_iter
        self.pad_multiple = pad_multiple

    def decode(
        self,
        mel: np.ndarray,
        model_mean: Optional[np.ndarray] = None,
        model_scale: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        from jatts_tpu.ops.dsp import griffin_lim

        start = time.time()
        if model_mean is not None:
            mel = mel * model_scale + model_mean
        t = mel.shape[0]
        # bucket-pad T so repeated calls hit one compiled program per bucket
        t_pad = ((t + self.pad_multiple - 1) // self.pad_multiple) * self.pad_multiple
        mel_p = np.pad(mel, ((0, t_pad - t), (0, 0)), mode="edge")
        wav = griffin_lim(
            jnp.asarray(mel_p, jnp.float32), self.sampling_rate,
            fft_size=self.fft_size, hop_size=self.hop_size,
            num_mels=self.num_mels,
            fmin=None if self.fmin is None else float(self.fmin),
            fmax=None if self.fmax is None else float(self.fmax),
            n_iter=self.n_iter, length=t_pad * self.hop_size,
        )
        wav = np.asarray(wav)[: t * self.hop_size]
        rtf = (time.time() - start) / max(len(wav) / self.sampling_rate, 1e-9)
        logging.info(f"griffin-lim: generated {len(wav)} samples (RTF {rtf:.3f})")
        return wav
