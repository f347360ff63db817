"""Stage-4 inference for mel models (reference jatts/bin/tts_decode.py:30-278).

TPU-first: utterances are bucketed by predicted length and decoded in
BATCHES through one jitted inference program per bucket (the reference loops
B=1 per utterance), then vocoded and written as wavs + mel plots.
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
import time

import numpy as np

from jatts_tpu.data.batcher import round_up
from jatts_tpu.data.dataset import TTSDataset
from jatts_tpu.models import get_model
from jatts_tpu.utils.checkpoint import find_latest_checkpoint, restore_checkpoint
from jatts_tpu.utils.config import load_config
from jatts_tpu.utils.io import read_hdf5, write_audio


def main():
    parser = argparse.ArgumentParser(description="Decode with a trained model (stage 4).")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--stats", required=True)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--expdir", default=None, help="locate latest checkpoint here")
    parser.add_argument("--config", required=True, help="exp config.yml")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--max-frames", type=int, default=2048)
    parser.add_argument(
        "--save-anasyn", action="store_true",
        help="also vocode ground-truth mels (analysis-synthesis debug wavs, "
        "reference tts_decode.py:257-274)",
    )
    parser.add_argument(
        "--vocoder", default="auto", choices=["auto", "griffin_lim"],
        help="'auto' = config-declared HiFi-GAN checkpoint when present; "
        "'griffin_lim' = weights-free jitted mel inversion",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    import jax
    import jax.numpy as jnp

    config = load_config(args.config)
    with open(args.token_list, encoding="utf-8") as f:
        n_vocab = len([l for l in f if l.strip()])
    model_params = dict(config["model_params"])
    model_params["idim"] = n_vocab
    model_cls = get_model(config["model_type"])
    model = model_cls(**model_params)

    ckpt_path = args.checkpoint or find_latest_checkpoint(args.expdir)
    if ckpt_path is None:
        raise FileNotFoundError("no checkpoint found")
    restored = restore_checkpoint(ckpt_path)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    dataset = TTSDataset(
        args.csv, args.stats, config.get("feat_list", ["mel"]), args.token_list,
        is_inference=True,
        hop_size=config.get("hop_size", 300),
        sampling_rate=config.get("sampling_rate", 24000),
    )
    mel_mean = np.asarray(read_hdf5(args.stats, "mel_mean"))
    mel_scale = np.asarray(read_hdf5(args.stats, "mel_scale"))

    voc_cfg = config.get("vocoder") or {}
    if args.vocoder != "griffin_lim" and voc_cfg.get("checkpoint") \
            and os.path.exists(voc_cfg["checkpoint"]):
        from jatts_tpu.vocoder import Vocoder

        vocoder = Vocoder(
            voc_cfg["checkpoint"], voc_cfg["config"], voc_cfg.get("stats")
        )
    else:
        # weights-free fallback (the reference always requires a
        # parallel_wavegan checkpoint): under --vocoder auto with NO usable
        # checkpoint this used to silently write only *_mel.npy — no wav/ —
        # and stage 5 then failed on the empty wavdir
        from jatts_tpu.vocoder import GriffinLimVocoder

        if args.vocoder != "griffin_lim" and voc_cfg.get("checkpoint"):
            logging.warning(
                f"vocoder checkpoint {voc_cfg['checkpoint']} not found; "
                "falling back to Griffin-Lim"
            )
        vocoder = GriffinLimVocoder(config)

    infer_kwargs = {}
    if config["model_type"].startswith("MatchaTTS"):
        infer_kwargs = dict(
            n_timesteps=int(config.get("ode_steps", 10)),
            temperature=float(config.get("temperature", 0.667)),
        )
    elif config["model_type"] == "VITS":
        infer_kwargs = dict(noise_scale=float(config.get("noise_scale", 0.667)))

    @jax.jit
    def infer(variables, xs, ilens, rng, spembs=None):
        return model.apply(
            variables, xs, ilens, args.max_frames, spembs,
            method=type(model).inference, rngs={"noise": rng},
            **infer_kwargs,
        )

    # multi-speaker (JVS-style spkemb conditioning): without this the jvs
    # recipes would decode every utterance with NO speaker identity —
    # wrong-but-plausible audio, no error
    use_spembs = bool((config.get("model_params") or {}).get("spk_embed_dim"))

    os.makedirs(os.path.join(args.outdir, "wav"), exist_ok=True)
    sr = int(config.get("sampling_rate", 24000))
    hop = int(config.get("hop_size", 300))

    items = [dataset[i] for i in range(len(dataset))]
    total_frames, total_time = 0, 0.0
    seen_shapes = set()  # first batch per shape pays compilation; exclude
    for i in range(0, len(items), args.batch_size):
        chunk = items[i : i + args.batch_size]
        t_text = round_up(max(len(it["x"]) for it in chunk), 16)
        xs = np.zeros((len(chunk), t_text), np.int32)
        ilens = np.zeros((len(chunk),), np.int32)
        for j, it in enumerate(chunk):
            xs[j, : len(it["x"])] = it["x"]
            ilens[j] = len(it["x"])
        spembs = None
        if use_spembs:
            missing = [it["utt_id"] for it in chunk if "spkemb" not in it]
            if missing:
                raise KeyError(
                    f"model has spk_embed_dim but no spkemb feature for "
                    f"{missing[:3]} — add 'spkemb' to feat_list/preprocess"
                )
            spembs = jnp.asarray(np.stack([
                np.asarray(it["spkemb"], np.float32).reshape(-1) for it in chunk
            ]))
        start = time.time()
        out = infer(variables, jnp.asarray(xs), jnp.asarray(ilens),
                    jax.random.key(i), spembs)
        feats = np.asarray(out["feat_gen"], np.float32)
        olens = np.asarray(out["olens"])
        elapsed = time.time() - start
        shape_key = (xs.shape[0], xs.shape[1])
        if shape_key in seen_shapes:  # steady-state timing only
            total_frames += int(olens.sum())
            total_time += elapsed
        seen_shapes.add(shape_key)
        for j, it in enumerate(chunk):
            mel = feats[j, : olens[j]]
            if vocoder is not None:
                min_frames = int(config.get("fft_size", 2048)) // hop + 1
                if mel.shape[0] < min_frames:
                    # degenerate prediction (durations rounded to ~0 —
                    # possible early in training): emit a short silence
                    # instead of crashing vocoding on a sub-window signal
                    logging.warning(
                        f"{it['utt_id']}: {mel.shape[0]}-frame prediction"
                    )
                    wav = np.zeros(hop * 8, np.float32)
                else:
                    wav = vocoder.decode(mel, mel_mean, mel_scale)
                write_audio(
                    os.path.join(args.outdir, "wav", f"{it['utt_id']}.wav"), wav, sr
                )
                if args.save_anasyn and "mel" in it:
                    wav_gt = vocoder.decode(np.asarray(it["mel"]), mel_mean, mel_scale)
                    os.makedirs(os.path.join(args.outdir, "wav_anasyn"), exist_ok=True)
                    write_audio(
                        os.path.join(args.outdir, "wav_anasyn", f"{it['utt_id']}.wav"),
                        wav_gt, sr,
                    )
            np.save(os.path.join(args.outdir, "wav", f"{it['utt_id']}_mel.npy"), mel)
    if total_time > 0:
        logging.info(
            f"inference speed = {total_frames / total_time:.1f} frames/sec "
            f"(RTF {total_time / max(total_frames * hop / sr, 1e-9):.6f})"
        )


if __name__ == "__main__":
    main()
