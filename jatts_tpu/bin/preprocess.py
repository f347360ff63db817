"""Stage-1 feature extraction (reference jatts/bin/preprocess.py:1-331).

Reads a csv shard, writes per-utterance .h5 dumps with wave/mel/pitch/energy
(+ prompt features), asserts mel frames == sum(durations), rewrites the csv
with feat_path. The DSP runs as jitted XLA ops (jatts_tpu.features) —
replacing the reference's 16-way multiprocess numpy pipeline with on-device
batched extraction.
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
import yaml

from jatts_tpu.features.extractors import Dio, Energy, LogMelExtractor
from jatts_tpu.utils.io import read_audio, read_csv, write_csv, write_hdf5


def main():
    parser = argparse.ArgumentParser(description="Extract features (stage 1).")
    parser.add_argument("--csv", required=True, help="input csv")
    parser.add_argument("--config", required=True, help="yaml config")
    parser.add_argument("--dumpdir", required=True, help="output h5 directory")
    parser.add_argument("--out-csv", default=None, help="output csv with feat_path")
    parser.add_argument("--f0-config", default=None, help="per-speaker f0 yaml")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)

    f0_ranges = {}
    if args.f0_config and os.path.exists(args.f0_config):
        with open(args.f0_config) as f:
            f0_ranges = yaml.load(f, Loader=yaml.SafeLoader) or {}

    sr = int(config["sampling_rate"])
    feat_list = list(config.get("feat_list", ["mel"]))
    # STFT settings are only required when spectral features are extracted
    # (codec-only ttslm recipes configure neither, reference encodec.py:18-100)
    hop = int(config.get("hop_size", 300))

    mel_ex = None if not ({"mel", "pitch", "energy"} & set(feat_list)) else LogMelExtractor(
        sampling_rate=sr,
        fft_size=config["fft_size"],
        hop_size=hop,
        win_length=config.get("win_length"),
        num_mels=config["num_mels"],
        fmin=config.get("fmin"),
        fmax=config.get("fmax"),
    )

    rows, fieldnames = read_csv(args.csv, dict_reader=True)
    os.makedirs(args.dumpdir, exist_ok=True)
    for row in rows:
        utt = row["sample_id"]
        spk = row.get("spk", "")
        wav, _ = read_audio(
            row["wav_path"], sr, row.get("start"), row.get("end"),
            gain=float(config.get("global_gain_scale", 1.0)),
        )
        feat_path = os.path.join(args.dumpdir, f"{utt}.h5")
        mel = mel_ex(wav) if mel_ex is not None else None

        durations = None
        if row.get("durations") and mel is not None:
            durations = np.asarray([int(d) for d in row["durations"].split()])
            # mel frames must match sum of durations (reference
            # preprocess.py:258-261); crop the overhang like the reference.
            assert abs(len(mel) - durations.sum()) <= 3, (
                f"{utt}: mel frames {len(mel)} != sum durations {durations.sum()}"
            )
            mel = mel[: durations.sum()]

        write_hdf5(feat_path, "wave", wav.astype(np.float32))
        if "mel" in feat_list:
            write_hdf5(feat_path, "mel", mel.astype(np.float32))
        if "pitch" in feat_list:
            f0min = float(f0_ranges.get(spk, {}).get("f0min", config.get("pitch_extract_f0min", 40)))
            f0max = float(f0_ranges.get(spk, {}).get("f0max", config.get("pitch_extract_f0max", 400)))
            dio = Dio(
                fs=sr, n_fft=config["fft_size"], hop_length=hop,
                f0min=f0min, f0max=f0max,
                use_token_averaged_f0=durations is not None,
            )
            pitch = dio(wav, feat_length=len(mel), durations=durations)
            write_hdf5(feat_path, "pitch", pitch)
        if "energy" in feat_list:
            en = Energy(
                fs=sr, n_fft=config["fft_size"], hop_length=hop,
                use_token_averaged_energy=durations is not None,
            )
            e = en(wav, feat_length=len(mel), durations=durations)
            write_hdf5(feat_path, "energy", e)
        if "spkemb" in feat_list:
            emb = _extract_spkemb(wav, sr, config.get("spkemb_model_path"))
            if emb is not None:
                write_hdf5(feat_path, "spkemb", emb)
        if any(f.startswith("encodec") for f in feat_list):
            codes = _extract_encodec(wav, sr, config.get("codec_path"))
            if codes is not None:
                write_hdf5(feat_path, "encodec", codes)
                if row.get("prompt_wav_path"):
                    p_wav, _ = read_audio(row["prompt_wav_path"], sr)
                    p_codes = _extract_encodec(p_wav, sr, config.get("codec_path"))
                    if p_codes is not None:
                        write_hdf5(feat_path, "prompt_encodec", p_codes)
        row["feat_path"] = feat_path

    out_csv = args.out_csv or args.csv
    write_csv(rows, out_csv, fieldnames=list(fieldnames) + (
        [] if "feat_path" in fieldnames else ["feat_path"]
    ))
    logging.info(f"processed {len(rows)} utterances -> {args.dumpdir}")


_ENCODEC_CACHE: dict = {}


def _extract_encodec(wav, sr, codec_path=None):
    """EnCodec RVQ codes [T, 8] via transformers when local weights exist
    (the reference's extractor, feature_extract/encodec.py:18-100). The
    model is cached per codec_path — reloading weights per utterance (2N
    loads with prompts) adds hours on a real corpus."""
    try:
        import torch  # noqa: PLC0415
        from transformers import EncodecModel  # noqa: PLC0415

        key = codec_path or "facebook/encodec_24khz"
        if key not in _ENCODEC_CACHE:
            _ENCODEC_CACHE[key] = EncodecModel.from_pretrained(key).eval()
        model = _ENCODEC_CACHE[key]
        with torch.no_grad():
            out = model.encode(torch.from_numpy(wav)[None, None], bandwidth=6.0)
        return out.audio_codes[0, 0].T.numpy().astype(np.int32)
    except Exception as e:  # noqa: BLE001 — package or weights unavailable
        logging.warning(f"encodec unavailable ({e}); skipping codes")
        return None


_SPKEMB_CACHE: dict = {}


def _extract_spkemb(wav, sr, model_path=None):
    """ECAPA speaker embedding (the reference's extractor,
    feature_extract/spkemb_speechbrain.py:14-30).

    Preferred path: the native JAX ECAPA-TDNN (features/ecapa.py) fed with
    speechbrain's ``embedding_model.ckpt`` from a local ``spkemb_model_path``
    (zero-egress). Falls back to the speechbrain package when importable;
    None otherwise. Audio is resampled to the 16 kHz the voxceleb model was
    trained on (the reference feeds the corpus rate as-is — a known quirk)."""
    if model_path:
        if "native" not in _SPKEMB_CACHE:
            from jatts_tpu.features.ecapa import EcapaSpkEmbExtractor  # noqa: PLC0415

            _SPKEMB_CACHE["native"] = EcapaSpkEmbExtractor(model_path)
        if sr != 16000:
            from scipy.signal import resample_poly  # noqa: PLC0415
            from math import gcd  # noqa: PLC0415

            g = gcd(16000, int(sr))
            wav = resample_poly(wav, 16000 // g, int(sr) // g)
        return _SPKEMB_CACHE["native"](wav).astype(np.float32)
    try:
        from speechbrain.pretrained import EncoderClassifier  # noqa: PLC0415
        import torch  # noqa: PLC0415

        if "sb" not in _SPKEMB_CACHE:
            _SPKEMB_CACHE["sb"] = EncoderClassifier.from_hparams(
                source="speechbrain/spkrec-ecapa-voxceleb"
            )
        with torch.no_grad():
            emb = _SPKEMB_CACHE["sb"].encode_batch(torch.from_numpy(wav)[None])
        return emb.squeeze().numpy().astype(np.float32)
    except Exception:  # noqa: BLE001 — package or weights unavailable
        logging.warning("speechbrain unavailable; skipping spkemb")
        return None


if __name__ == "__main__":
    main()
