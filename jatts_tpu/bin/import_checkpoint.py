"""Convert a reference PyTorch checkpoint (.pkl) into an orbax checkpoint
usable by tts_decode / tts_train --pretrain.

Covers all six model families — FastSpeech2 / MatchaTTS / MatchaTTS_MAS /
VITS / E2TTS / VALL-E AR+NAR (model importers with reference-parity tests,
utils/torch_import.py) — and HiFi-GAN vocoder pkls (vocoder/convert.py —
pass --kind hifigan). E2-TTS checkpoints default to the EMA weights (what
the reference's decode uses, bin/e2tts_decode.py:144-150); pass --no-ema for
the raw model weights.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description="Import a reference checkpoint.")
    parser.add_argument("--checkpoint", required=True, help="reference .pkl")
    parser.add_argument("--config", required=True, help="experiment yaml")
    parser.add_argument("--token-list", default=None)
    parser.add_argument("--out", required=True, help="output orbax dir")
    parser.add_argument("--kind", default="model", choices=["model", "hifigan"])
    parser.add_argument(
        "--no-ema", action="store_true",
        help="E2TTS: import the raw model weights instead of the EMA weights",
    )
    args = parser.parse_args()
    logging.basicConfig(force=True, level=logging.INFO)

    from jatts_tpu.utils.checkpoint import save_checkpoint
    from jatts_tpu.utils.config import load_config

    if args.kind == "hifigan":
        from jatts_tpu.vocoder.convert import (
            hifigan_torch_to_flax,
            load_torch_state_dict,
        )

        variables = hifigan_torch_to_flax(load_torch_state_dict(args.checkpoint))
        state = {"params": variables["params"], "steps": 0}
    else:
        from jatts_tpu.models import get_model
        from jatts_tpu.utils.torch_import import (
            convert_e2tts,
            convert_fastspeech2,
            convert_matchatts,
            convert_valle,
            convert_vits,
            load_reference_checkpoint,
            load_reference_e2tts_state,
        )

        config = load_config(args.config)
        mp = dict(config["model_params"])
        if args.token_list:
            with open(args.token_list, encoding="utf-8") as f:
                mp["idim"] = len([l for l in f if l.strip()])
        model = get_model(config["model_type"])(**mp)
        if config["model_type"] == "E2TTS":
            # reference E2-TTS checkpoints carry model + EMA state dicts
            # (trainers/e2tts.py:155-210); EMA-only checkpoints auto-detected
            sd = load_reference_e2tts_state(args.checkpoint, use_ema=not args.no_ema)
        else:
            sd = load_reference_checkpoint(args.checkpoint)
        converter = {
            "FastSpeech2": convert_fastspeech2,
            "MatchaTTS": convert_matchatts,
            "MatchaTTS_MAS": convert_matchatts,
            "VITS": convert_vits,
            "E2TTS": convert_e2tts,
            "VALLEAR": convert_valle,
            "VALLENAR": convert_valle,
        }[config["model_type"]]
        variables = converter(sd, model)
        state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "steps": 0,
            "epochs": 0,
        }
    import os

    outdir, name = os.path.split(os.path.abspath(args.out))
    # save under the expected checkpoint-naming scheme
    path = save_checkpoint(outdir if name.startswith("checkpoint-") else args.out, 0, state)
    logging.info(f"imported -> {path}")


if __name__ == "__main__":
    main()
