"""VALL-E two-stage decode CLI (reference jatts/bin/ttslm_decode.py:32-245).

Loads separate AR + NAR checkpoints, encodes the prompt wav with the neural
codec, generates level 0 with the KV-cached AR loop, fills levels 1..7 with
the NAR model, decodes codes to waveform.

The codec is pluggable: EnCodec via transformers when local weights exist
(--codec-path), else the decode stage stops at code dumps.
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
from jatts_tpu.models.valle import VALLEAR, VALLENAR, ar_generate
from jatts_tpu.utils.checkpoint import find_latest_checkpoint, restore_checkpoint
from jatts_tpu.utils.config import load_config
from jatts_tpu.utils.io import read_audio, read_csv, write_audio


def _load_codec(codec_path, sr):
    try:
        import torch  # noqa: PLC0415
        from transformers import EncodecModel  # noqa: PLC0415

        model = EncodecModel.from_pretrained(codec_path).eval()

        def encode(wav):
            with torch.no_grad():
                out = model.encode(
                    torch.from_numpy(wav)[None, None], bandwidth=6.0
                )
            return out.audio_codes[0, 0].T.numpy()  # [T, 8]

        def decode(codes):
            # audio_codes: (nb_frames, batch, nq, frame_len)
            with torch.no_grad():
                wav = model.decode(
                    torch.from_numpy(codes.T.copy()).long()[None, None], [None]
                ).audio_values
            return wav[0, 0].numpy()

        return encode, decode
    except Exception as e:  # noqa: BLE001
        logging.warning(f"codec unavailable ({e}); emitting code dumps only")
        return None, None


def main():
    parser = argparse.ArgumentParser(description="VALL-E decoding (stage 5).")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--ar-checkpoint", default=None)
    parser.add_argument("--ar-expdir", default=None)
    parser.add_argument("--ar-config", required=True)
    parser.add_argument("--nar-checkpoint", default=None)
    parser.add_argument("--nar-expdir", default=None)
    parser.add_argument("--nar-config", required=True)
    parser.add_argument("--codec-path", default=None, help="local EnCodec weights")
    parser.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="compute dtype for the LM (bf16: 1.25x decode, f32 logits for "
        "sampling either way)",
    )
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--max-steps", type=int, default=1000)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING)

    import jax
    import jax.numpy as jnp

    ar_config = load_config(args.ar_config)
    nar_config = load_config(args.nar_config)
    with open(args.token_list, encoding="utf-8") as f:
        n_vocab = len([l for l in f if l.strip()])

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def build(cls, config, ckpt, expdir):
        mp = dict(config["model_params"])
        mp["idim"] = n_vocab
        mp.setdefault("dtype", dtype)
        model = cls(**mp)
        restored = restore_checkpoint(ckpt or find_latest_checkpoint(expdir))
        params = restored["params"]
        if dtype == jnp.bfloat16:
            # bf16 params halve HBM reads in the bandwidth-bound KV decode
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == np.float32 else x,
                params,
            )
        return model, {"params": params}

    ar_model, ar_vars = build(VALLEAR, ar_config, args.ar_checkpoint, args.ar_expdir)
    nar_model, nar_vars = build(VALLENAR, nar_config, args.nar_checkpoint, args.nar_expdir)

    sr = int(ar_config.get("codec_sampling_rate", 24000))
    encode, decode = _load_codec(args.codec_path, sr) if args.codec_path else (None, None)
    conv = TokenIDConverter(args.token_list)

    # jit BOTH stages once with bucketed static shapes (text rounded up,
    # prompt at its fixed capacity, NAR at max_steps): the reference — and
    # round-3's CLI — ran them eagerly with per-utterance shapes, which is
    # pathological through remote dispatch and recompiles per length in
    # serving. The packed-segment layout masks everything beyond the lens,
    # and level0 is sanitized in-program (pad/stop tokens would otherwise
    # index out of the NAR embedding table), so padding is semantically
    # inert — verified by tests/test_valle_padded_decode.py.
    from jatts_tpu.data.batcher import round_up
    from jatts_tpu.models.valle import nar_generate

    tp_cap = ar_model.prompt_max_frame_length

    @jax.jit
    def run_ar(rng, text, text_lens, proms, prom_lens):
        return ar_generate(
            ar_model, ar_vars, rng, text, text_lens, proms, prom_lens,
            max_steps=args.max_steps,
        )

    @jax.jit
    def run_nar(rng, text, text_lens, proms, prom_lens, level0, resp_lens):
        return nar_generate(
            nar_model, nar_vars, rng, text, text_lens, proms, prom_lens,
            level0, resp_lens,
        )

    rows, _ = read_csv(args.csv, dict_reader=True)
    for sub in ("wav", "wav_ar", "wav_prompt", "codes"):
        os.makedirs(os.path.join(args.outdir, sub), exist_ok=True)

    for i, row in enumerate(rows):
        utt = row["sample_id"]
        ids = np.asarray(conv.tokens2ids(row["phonemes"].split(" ")), np.int32)
        if encode is not None:
            prompt_wav, _ = read_audio(row["prompt_wav_path"], sr)
            prom = encode(prompt_wav).astype(np.int32)  # [Tp, 8]
        elif row.get("prompt_feat_path"):
            from jatts_tpu.utils.io import read_hdf5  # noqa: PLC0415

            prom = np.asarray(read_hdf5(row["prompt_feat_path"], "encodec")).astype(np.int32)
            if prom.shape[0] == 8:
                prom = prom.T
        else:
            raise RuntimeError("no codec and no precomputed prompt codes")
        prom = prom[:tp_cap]

        tx = round_up(len(ids), 16)
        xs = np.zeros((1, tx), np.int32)
        xs[0, : len(ids)] = ids
        proms_p = np.zeros((1, tp_cap, prom.shape[1]), np.int32)
        proms_p[0, : len(prom)] = prom

        ar_out = run_ar(
            jax.random.key(i), jnp.asarray(xs), jnp.asarray([len(ids)]),
            jnp.asarray(proms_p), jnp.asarray([len(prom)]),
        )
        n_gen = int(ar_out["resp_lens"][0])
        if n_gen == 0:
            logging.warning(f"{utt}: AR generated nothing")
            continue

        codes = run_nar(
            jax.random.key(1000 + i), jnp.asarray(xs), jnp.asarray([len(ids)]),
            jnp.asarray(proms_p), jnp.asarray([len(prom)]),
            ar_out["codes"], ar_out["resp_lens"],
        )
        codes = np.asarray(codes)[0, :n_gen]  # [T, 8]
        level0 = codes[None, :, 0]
        np.save(os.path.join(args.outdir, "codes", f"{utt}.npy"), codes)
        if decode is not None:
            write_audio(os.path.join(args.outdir, "wav", f"{utt}.wav"), decode(codes), sr)
            ar_codes = np.repeat(level0[0][:, None], 8, axis=1)
            write_audio(
                os.path.join(args.outdir, "wav_ar", f"{utt}.wav"),
                decode(ar_codes), sr,
            )
            write_audio(
                os.path.join(args.outdir, "wav_prompt", f"{utt}.wav"),
                decode(prom), sr,
            )
    logging.info(f"decoded {len(rows)} utterances")


if __name__ == "__main__":
    main()
