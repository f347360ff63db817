"""Export a trained mel model (+ optional HiFi-GAN) as an AOT serving bundle.

TPU-native serving counterpart of stage-4 decoding (reference
jatts/bin/tts_decode.py runs Python model code per request): serializes the
jitted text->mel(->wav) inference via jax.export — weights baked in, one
program per text-length bucket, platform-annotated — into ONE .npz artifact
that a serving process loads WITHOUT the model's Python code
(jatts_tpu/serving/export.py).

    python -m jatts_tpu.bin.export_serving \\
        --config exp/fs2/config.yml --stats dump/stats.h5 \\
        --token-list dump/tokens.txt --expdir exp/fs2 \\
        --out exp/fs2/serving.npz --text-buckets 32,64,128
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
import logging

import numpy as np

from jatts_tpu.models import get_model
from jatts_tpu.serving.export import build_infer_fn, export_bundle
from jatts_tpu.utils.checkpoint import find_latest_checkpoint, restore_checkpoint
from jatts_tpu.utils.config import load_config
from jatts_tpu.utils.io import read_hdf5


def main():
    parser = argparse.ArgumentParser(
        description="Export a trained model as an AOT serving bundle."
    )
    parser.add_argument("--config", default=None, help="exp config.yml (mel models)")
    parser.add_argument("--stats", default=None)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--expdir", default=None, help="locate latest checkpoint here")
    # VALL-E two-stage export (instead of --config/--stats):
    parser.add_argument("--ar-config", default=None)
    parser.add_argument("--ar-checkpoint", default=None)
    parser.add_argument("--ar-expdir", default=None)
    parser.add_argument("--nar-config", default=None)
    parser.add_argument("--nar-checkpoint", default=None)
    parser.add_argument("--nar-expdir", default=None)
    parser.add_argument("--max-steps", type=int, default=1000,
                        help="VALL-E AR response capacity")
    parser.add_argument("--out", required=True, help="output .npz bundle path")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument(
        "--text-buckets", default="32,64,128",
        help="comma-separated text-length buckets (one program each)",
    )
    parser.add_argument("--max-frames", type=int, default=2048)
    parser.add_argument(
        "--platforms", default="tpu,cpu",
        help="comma-separated jax.export lowering platforms",
    )
    parser.add_argument(
        "--vocoder", default="auto", choices=["auto", "none", "stream"],
        help="'auto' bakes the config-declared HiFi-GAN in (text->wav "
        "artifact) when its checkpoint exists; 'none' exports mel only; "
        "'stream' exports mel + a chunked-vocoder program for low "
        "time-to-first-audio serving (BatchingServer.submit_stream)",
    )
    parser.add_argument(
        "--stream-chunk", type=int, default=128,
        help="mel frames per streamed audio chunk (--vocoder stream)",
    )
    parser.add_argument(
        "--wav-format", default="pcm16", choices=["pcm16", "f32"],
        help="waveform output of text->wav artifacts: int16 PCM quantized "
        "in-program (5x smaller serving payload) or float32 (+ mel)",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    with open(args.token_list, encoding="utf-8") as f:
        n_vocab = len([l for l in f if l.strip()])
    buckets = [int(t) for t in args.text_buckets.split(",") if t]
    platforms = [p for p in args.platforms.split(",") if p]

    if args.ar_config:
        _export_valle(args, n_vocab, buckets, platforms)
        return
    if not args.config or not args.stats:
        raise SystemExit("--config and --stats are required (or --ar-config/"
                         "--nar-config for a VALL-E bundle)")

    config = load_config(args.config)
    model_params = dict(config["model_params"])
    model_params["idim"] = n_vocab
    model = get_model(config["model_type"])(**model_params)

    ckpt_path = args.checkpoint or find_latest_checkpoint(args.expdir)
    if ckpt_path is None:
        raise FileNotFoundError("no checkpoint found")
    restored = restore_checkpoint(ckpt_path)
    if config["model_type"] == "E2TTS":
        # prefer EMA weights, like bin/e2tts_decode.py
        params = restored.get("ema_params") or restored["params"]
        variables = {"params": params}
    else:
        variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    mel_mean = np.asarray(read_hdf5(args.stats, "mel_mean"))
    mel_scale = np.asarray(read_hdf5(args.stats, "mel_scale"))

    if config["model_type"] == "E2TTS":
        from jatts_tpu.serving.export import build_e2tts_bundle_cli

        out = build_e2tts_bundle_cli(
            args.out, config, model, variables, mel_mean, mel_scale,
            args.batch_size, buckets, args.max_frames, platforms,
        )
        _log_written(out, {"output": "mel"}, buckets, args)
        return

    vocoder = None
    voc_cfg = config.get("vocoder") or {}
    if args.vocoder in ("auto", "stream") and voc_cfg.get("checkpoint") \
            and _os.path.exists(voc_cfg["checkpoint"]):
        from jatts_tpu.vocoder import Vocoder

        vocoder = Vocoder(
            voc_cfg["checkpoint"], voc_cfg["config"], voc_cfg.get("stats")
        )
    stream = None
    if args.vocoder == "stream":
        if vocoder is None:
            raise SystemExit("--vocoder stream needs the config-declared "
                             "vocoder checkpoint on disk")
        from jatts_tpu.serving.export import build_stream_step_fn

        stream = build_stream_step_fn(
            vocoder, args.max_frames, int(config.get("num_mels", 80)),
            chunk=args.stream_chunk,
        )
        vocoder = None  # the mel program stays vocoder-free

    spk_dim = int(model_params.get("spk_embed_dim") or 0)
    fn, weights = build_infer_fn(
        config, model, variables, mel_mean, mel_scale, args.max_frames,
        vocoder=vocoder, use_spembs=bool(spk_dim),
        wav_format=args.wav_format,
    )
    meta = {
        "model_type": config["model_type"],
        "num_mels": int(config.get("num_mels", 80)),
        "sampling_rate": int(config.get("sampling_rate", 24000)),
        "hop_size": int(vocoder.hop_size if vocoder is not None
                        else config.get("hop_size", 300)),
        "max_frames": int(args.max_frames),
        "output": "wav" if vocoder is not None else "mel",
        "wav_format": args.wav_format if vocoder is not None else None,
        "checkpoint": _os.path.basename(str(ckpt_path)),
    }
    out = export_bundle(
        args.out, fn, args.batch_size, buckets, meta, spk_dim=spk_dim,
        platforms=platforms, weights=weights, stream=stream,
    )
    _log_written(out, meta, buckets, args)


def _export_valle(args, n_vocab, buckets, platforms):
    """VALL-E bundle: the fused AR+NAR two-stage decode as one program per
    text bucket (text + prompt codes -> RVQ codes; codec decode external)."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.models.valle import VALLEAR, VALLENAR
    from jatts_tpu.serving.export import build_valle_fn, export_valle_bundle

    if not args.nar_config:
        raise SystemExit("--nar-config is required with --ar-config")

    def build(cls, config_path, ckpt, expdir):
        config = load_config(config_path)
        mp = dict(config["model_params"])
        mp["idim"] = n_vocab
        mp.setdefault("dtype", jnp.bfloat16)
        model = cls(**mp)
        restored = restore_checkpoint(ckpt or find_latest_checkpoint(expdir))
        # bf16-resident params: the KV decode is HBM-bandwidth bound
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == np.float32 else x,
            restored["params"],
        )
        return config, model, {"params": params}

    ar_config, ar_model, ar_vars = build(
        VALLEAR, args.ar_config, args.ar_checkpoint, args.ar_expdir
    )
    _, nar_model, nar_vars = build(
        VALLENAR, args.nar_config, args.nar_checkpoint, args.nar_expdir
    )
    fn, weights = build_valle_fn(
        ar_model, ar_vars, nar_model, nar_vars, max_steps=args.max_steps,
        ar_temperature=float(ar_config.get("sampling_temperature", 1.0)),
        nar_temperature=float(ar_config.get("nar_sampling_temperature", 0.2)),
    )
    meta = {
        "model_type": "VALLE",
        "sampling_rate": int(ar_config.get("codec_sampling_rate", 24000)),
        "max_steps": int(args.max_steps),
    }
    out = export_valle_bundle(
        args.out, fn, args.batch_size, buckets,
        prompt_frames=ar_model.prompt_max_frame_length,
        n_prom_levels=ar_model.n_prom_levels,
        meta=meta, platforms=platforms, weights=weights,
    )
    _log_written(out, dict(meta, output="codes"), buckets, args)


def _log_written(out, meta, buckets, args):
    size_mb = _os.path.getsize(out) / 2**20
    logging.info(
        f"exported {meta['output']} bundle -> {out} "
        f"({size_mb:.1f} MiB, buckets {buckets}, B={args.batch_size}, "
        f"platforms {args.platforms})"
    )


if __name__ == "__main__":
    main()
