"""Intermediate-result generation at eval intervals (reference per-model
``_genearete_and_save_intermediate_result``, e.g. trainers/fastspeech2.py:102-223):
inference on a few dev utterances, generated-vs-reference mel plots, duration
dumps, optional vocoded wavs under ``exp/*/predictions/<steps>steps/``.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from jatts_tpu.utils.plot import plot_1d, plot_generated_and_ref


def make_mel_eval_hook(
    dev_items,
    num_save: int = 4,
    max_frames: int = 2048,
    vocoder=None,
    mel_stats: Optional[tuple] = None,
    infer_kwargs: Optional[Dict[str, Any]] = None,
):
    """Returns an eval_hook(trainer) for mel-output models."""
    items = dev_items[:num_save]
    infer_kwargs = infer_kwargs or {}

    def hook(trainer):
        import jax
        import jax.numpy as jnp

        model = trainer.model
        if not hasattr(type(model), "inference"):
            return
        outdir = os.path.join(trainer.outdir, "predictions", f"{trainer.steps}steps")
        os.makedirs(outdir, exist_ok=True)
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats

        t_text = max(len(it["x"]) for it in items)
        xs = np.zeros((len(items), t_text), np.int32)
        ilens = np.zeros((len(items),), np.int32)
        for j, it in enumerate(items):
            xs[j, : len(it["x"])] = it["x"]
            ilens[j] = len(it["x"])
        # speaker conditioning (multi-speaker recipes): pass spembs when the
        # model integrates them — otherwise intermediate previews (and their
        # plots) silently lose speaker identity
        spembs = None
        if getattr(model, "spk_embed_dim", None) and all(
            "spkemb" in it for it in items
        ):
            spembs = jnp.asarray(np.stack([
                np.asarray(it["spkemb"], np.float32).reshape(-1) for it in items
            ]))
        start = time.time()
        out = model.apply(
            variables, jnp.asarray(xs), jnp.asarray(ilens), max_frames, spembs,
            method=type(model).inference, rngs={"noise": jax.random.key(trainer.steps)},
            **infer_kwargs,
        )
        feats = np.asarray(out["feat_gen"], np.float32)
        olens = np.asarray(out["olens"])
        elapsed = time.time() - start
        logging.info(
            f"(steps {trainer.steps}) inference speed = "
            f"{olens.sum() / max(elapsed, 1e-9):.1f} frames/sec"
        )
        for j, it in enumerate(items):
            utt = it.get("utt_id", str(j))
            gen = feats[j, : olens[j]]
            ref = np.asarray(it.get("mel", gen))
            plot_generated_and_ref(gen, ref, os.path.join(outdir, f"{utt}.png"))
            if "duration" in out and "durations" in it:
                d_pred = np.asarray(out["duration"])[j, : ilens[j]]
                with open(os.path.join(outdir, f"{utt}_dur.txt"), "w") as f:
                    f.write(f"pred: {' '.join(map(str, d_pred))}\n")
                    f.write(f"gt:   {' '.join(map(str, it['durations']))}\n")
            if vocoder is not None and mel_stats is not None:
                from jatts_tpu.utils.io import write_audio  # noqa: PLC0415

                wav = vocoder.decode(gen, mel_stats[0], mel_stats[1])
                write_audio(
                    os.path.join(outdir, f"{utt}.wav"), wav, vocoder.sampling_rate
                )
            if "pitch" in out:
                plot_1d(
                    np.asarray(out["pitch"])[j, : ilens[j], 0],
                    os.path.join(outdir, f"{utt}_pitch.png"),
                    "predicted token pitch",
                )

    return hook
