"""E2-TTS inference CLI (reference jatts/bin/e2tts_decode.py:30-321).

Input per utterance: prompt_phonemes + [filler 0] + phonemes; prompt mel is
computed on the fly from the prompt wav; total duration heuristic = prompt
frames + phones * frames-per-phone. Batched, jitted CFG Euler sampling; EMA
weights are used when present in the checkpoint.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

# persistent XLA compile cache: CLI stages are separate processes; without
# this every stage repays full compilation
import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # default persistent cache; an env override wins (e.g. tests point it at
    # the committed suite cache -- stale AOT entries compiled on another
    # machine load-fail loudly and slowly, see CLAUDE.md)
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
import logging
import os

import numpy as np

from jatts_tpu.data.token_id_converter import TokenIDConverter
from jatts_tpu.features.extractors import LogMelExtractor
from jatts_tpu.models.e2tts import E2TTS
from jatts_tpu.utils.checkpoint import find_latest_checkpoint, restore_checkpoint
from jatts_tpu.utils.config import load_config
from jatts_tpu.utils.io import read_audio, read_csv, read_hdf5, write_audio


def main():
    parser = argparse.ArgumentParser(description="E2-TTS decoding (stage 4).")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--stats", required=True)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--expdir", default=None)
    parser.add_argument("--config", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument(
        "--vocoder", default="auto", choices=["auto", "griffin_lim"],
        help="'auto' = config-selected HiFi-GAN checkpoint when usable; "
        "'griffin_lim' = weights-free jitted mel inversion",
    )
    parser.add_argument("--frames-per-phone", type=float, default=12.0)
    parser.add_argument("--max-frames", type=int, default=3000)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING)

    import jax
    import jax.numpy as jnp

    config = load_config(args.config)
    with open(args.token_list, encoding="utf-8") as f:
        n_vocab = len([l for l in f if l.strip()])
    model_params = dict(config["model_params"])
    model_params["idim"] = n_vocab
    model = E2TTS(**model_params)

    ckpt_path = args.checkpoint or find_latest_checkpoint(args.expdir)
    restored = restore_checkpoint(ckpt_path)
    # prefer EMA weights (reference e2tts_decode.py:144-150)
    params = restored.get("ema_params") or restored["params"]
    variables = {"params": params}

    sr = int(config["sampling_rate"])
    hop = int(config["hop_size"])
    mel_ex = LogMelExtractor(
        sampling_rate=sr, fft_size=config["fft_size"], hop_size=hop,
        num_mels=config["num_mels"], fmin=config.get("fmin"),
        fmax=config.get("fmax"),
    )
    mel_mean = np.asarray(read_hdf5(args.stats, "mel_mean"))
    mel_scale = np.asarray(read_hdf5(args.stats, "mel_scale"))
    conv = TokenIDConverter(args.token_list)

    voc_cfg = config.get("vocoder") or {}
    if args.vocoder != "griffin_lim" and voc_cfg.get("checkpoint") \
            and os.path.exists(voc_cfg["checkpoint"]):
        from jatts_tpu.vocoder import Vocoder

        vocoder = Vocoder(voc_cfg["checkpoint"], voc_cfg["config"], voc_cfg.get("stats"))
    else:
        # weights-free fallback, mirroring tts_decode: without it a missing
        # vocoder checkpoint wrote only *_mel.npy and stage 5 (evaluate on
        # results/wav) failed on the empty wavdir
        from jatts_tpu.vocoder import GriffinLimVocoder

        if args.vocoder != "griffin_lim" and voc_cfg.get("checkpoint"):
            logging.warning(
                f"vocoder checkpoint {voc_cfg['checkpoint']} not found; "
                "falling back to Griffin-Lim"
            )
        vocoder = GriffinLimVocoder(config)

    steps = int(config.get("nfe_step", 32))
    cfg_strength = float(config.get("cfg_strength", 1.0))
    sway = config.get("sway_sampling_coef")

    @jax.jit
    def infer(variables, cond, text, ref_lens, duration, rng):
        return model.apply(
            variables, cond, text, ref_lens, duration, steps, cfg_strength, sway,
            method=E2TTS.inference, rngs={"noise": rng},
        )

    rows, _ = read_csv(args.csv, dict_reader=True)
    os.makedirs(os.path.join(args.outdir, "wav"), exist_ok=True)
    for i, row in enumerate(rows):
        prompt_wav, _ = read_audio(row["prompt_wav_path"], sr)
        prompt_mel = (mel_ex(prompt_wav) - mel_mean) / mel_scale
        ids = conv.tokens2ids(
            row["prompt_phonemes"].split(" ") + ["<blank>"] + row["phonemes"].split(" ")
        )
        n_gen = int(len(row["phonemes"].split(" ")) * args.frames_per_phone)
        t_max = args.max_frames
        # clamp the prompt so generation capacity remains: an over-long
        # prompt (> max_frames - n_gen) would otherwise make the generated
        # slice [n_prompt:duration] empty (or point past the cond buffer)
        n_prompt = min(len(prompt_mel), max(t_max - n_gen, 0))
        if n_prompt < len(prompt_mel):
            logging.warning(
                f"{row['sample_id']}: prompt truncated "
                f"{len(prompt_mel)} -> {n_prompt} frames to fit --max-frames"
            )
        duration = min(n_prompt + n_gen, t_max)
        cond = np.zeros((1, t_max, config["num_mels"]), np.float32)
        cond[0, :n_prompt] = prompt_mel[:n_prompt]
        text = -np.ones((1, len(ids)), np.int32)
        text[0] = ids
        out = infer(
            variables, jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray([n_prompt]), jnp.asarray([duration]), jax.random.key(i),
        )
        mel = np.asarray(out["feat_gen"])[0, n_prompt:duration]
        utt = row["sample_id"]
        np.save(os.path.join(args.outdir, "wav", f"{utt}_mel.npy"), mel)
        if vocoder is not None:
            wav = vocoder.decode(mel, mel_mean, mel_scale)
            write_audio(os.path.join(args.outdir, "wav", f"{utt}.wav"), wav, sr)
    logging.info(f"decoded {len(rows)} utterances")


if __name__ == "__main__":
    main()
