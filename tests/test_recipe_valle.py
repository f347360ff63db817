"""VALL-E recipe path: fake EnCodec dumps -> AR + NAR training via tts_train
(VALLECollater through TTSDataset) -> two-stage ttslm_decode (code dumps,
codec gated off)."""

import os
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_csv, write_hdf5


def _make_corpus(root, n=4):
    rng = np.random.default_rng(0)
    rows = []
    os.makedirs(os.path.join(root, "dump"), exist_ok=True)
    phones = ["a", "i", "u", "e", "o"]
    for i in range(n):
        t = int(rng.integers(20, 40))
        codes = rng.integers(0, 64, (t, 8)).astype(np.int32)
        feat_path = os.path.join(root, "dump", f"utt{i}.h5")
        write_hdf5(feat_path, "encodec", codes)
        rows.append(
            {
                "sample_id": f"utt{i}",
                "spk": "s",
                "wav_path": "",
                "start": "",
                "end": "",
                "original_text": "dummy",
                "phonemes": " ".join(rng.choice(phones, int(rng.integers(3, 6)))),
                "feat_path": feat_path,
                "prompt_feat_path": os.path.join(root, "dump", "utt0.h5"),
            }
        )
    csv_path = os.path.join(root, "data.csv")
    write_csv(rows, csv_path)
    return csv_path


def _run(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def _config(model_type, n_resp_levels):
    return {
        "sampling_rate": 24000,
        "feat_list": ["encodec"],
        "out_feat_type": "encodec",
        "prompt_strategy": "given",
        # AR exercises the CLI dp x tp path (mesh: {model: 2} -> get_mesh);
        # the tiny kernels stay replicated (below shard_params_tp min_size),
        # actual sharding is covered by tests/test_train_tp.py
        **({"mesh": {"model": 2}} if model_type == "VALLEAR" else {}),
        "model_type": model_type,
        "model_params": {
            "n_tokens": 64, "d_model": 32, "n_heads": 2, "n_layers": 2,
            "n_prom_levels": 8, "n_resp_levels": n_resp_levels,
            "prompt_max_frame_length": 24,
        },
        "trainer_type": "VALLETrainer",
        "collater_type": "VALLECollater",
        "criterions": {},
        "batch_size": 4,
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 1e-4},
        "grad_norm": 1.0,
        "scheduler": "warmuplr",
        "scheduler_params": {"warmup_steps": 2},
        "train_max_steps": 2,
        "save_interval_steps": 2,
        "eval_interval_steps": 0,
        "log_interval_steps": 1,
    }


@pytest.mark.slow
def test_valle_recipe(tmp_path):
    root = str(tmp_path)
    csv_path = _make_corpus(root)
    tokens = os.path.join(root, "tokens.txt")
    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.tts_train import main as train_main
    from jatts_tpu.bin.ttslm_decode import main as decode_main

    _run(tokens_main, ["t", "--csv", csv_path, "--out", tokens])

    exps = {}
    for name, model_type, levels in (("ar", "VALLEAR", 1), ("nar", "VALLENAR", 7)):
        conf = os.path.join(root, f"{name}.yaml")
        with open(conf, "w") as f:
            yaml.dump(_config(model_type, levels), f)
        expdir = os.path.join(root, f"exp_{name}")
        _run(train_main, [
            "tr", "--train-csv", csv_path, "--dev-csv", csv_path,
            "--stats", os.path.join(root, "nonexistent_stats.h5"),
            "--token-list", tokens, "--config", conf, "--outdir", expdir,
        ])
        exps[name] = expdir

    outdir = os.path.join(root, "decode")
    _run(decode_main, [
        "d", "--csv", csv_path, "--token-list", tokens,
        "--ar-expdir", exps["ar"], "--ar-config", os.path.join(exps["ar"], "config.yml"),
        "--nar-expdir", exps["nar"], "--nar-config", os.path.join(exps["nar"], "config.yml"),
        "--outdir", outdir, "--max-steps", "16",
    ])
    code_files = os.listdir(os.path.join(outdir, "codes"))
    assert len(code_files) >= 1
    codes = np.load(os.path.join(outdir, "codes", code_files[0]))
    assert codes.ndim == 2 and codes.shape[1] == 8
    assert (codes >= 0).all() and (codes < 64).all()


@pytest.mark.slow
def test_valle_recipe_with_tiny_codec(tmp_path, tmp_path_factory):
    """Full ttslm path with a REAL (tiny, random-weights) EnCodec: preprocess
    encodes wavs -> AR+NAR train -> ttslm_decode --codec-path emits actual
    waveforms (upgrades the codec-gated path to tested end-to-end)."""
    from tiny_models import make_tiny_encodec

    from jatts_tpu.utils.io import write_audio

    codec_dir = make_tiny_encodec(str(tmp_path_factory.mktemp("codec")))
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    phones = ["a", "i", "u", "e", "o"]
    rows = []
    for i in range(4):
        n = int(rng.integers(6000, 12000))
        wav = (rng.normal(size=n) * 0.1).astype(np.float32)
        path = os.path.join(root, "wav", f"utt{i}.wav")
        write_audio(path, wav, 24000)
        rows.append({
            "sample_id": f"utt{i}", "spk": "s", "wav_path": path,
            "start": "", "end": "", "original_text": "dummy",
            "phonemes": " ".join(rng.choice(phones, int(rng.integers(3, 6)))),
            "prompt_wav_path": os.path.join(root, "wav", "utt0.wav"),
        })
    csv_path = os.path.join(root, "data.csv")
    write_csv(rows, csv_path)

    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.preprocess import main as preprocess_main
    from jatts_tpu.bin.tts_train import main as train_main
    from jatts_tpu.bin.ttslm_decode import main as decode_main

    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["t", "--csv", csv_path, "--out", tokens])

    exps = {}
    for name, model_type, levels in (("ar", "VALLEAR", 1), ("nar", "VALLENAR", 7)):
        cfg = _config(model_type, levels)
        cfg["codec_path"] = codec_dir
        cfg["model_params"]["n_tokens"] = 1024  # EnCodec codebook size
        conf = os.path.join(root, f"{name}.yaml")
        with open(conf, "w") as f:
            yaml.dump(cfg, f)
        if name == "ar":  # preprocess once, driven by the AR config
            _run(preprocess_main, [
                "p", "--csv", csv_path, "--config", conf,
                "--dumpdir", os.path.join(root, "dump"),
                "--out-csv", csv_path,
            ])
            import h5py

            rows2, _ = __import__("jatts_tpu.utils.io", fromlist=["read_csv"]).read_csv(
                csv_path, dict_reader=True
            )
            with h5py.File(rows2[0]["feat_path"], "r") as f:
                assert f["encodec"][()].shape[1] == 8
        expdir = os.path.join(root, f"exp_{name}")
        _run(train_main, [
            "tr", "--train-csv", csv_path, "--dev-csv", csv_path,
            "--stats", os.path.join(root, "nonexistent_stats.h5"),
            "--token-list", tokens, "--config", conf, "--outdir", expdir,
        ])
        exps[name] = expdir

    outdir = os.path.join(root, "decode")
    _run(decode_main, [
        "d", "--csv", csv_path, "--token-list", tokens,
        "--ar-expdir", exps["ar"], "--ar-config", os.path.join(exps["ar"], "config.yml"),
        "--nar-expdir", exps["nar"], "--nar-config", os.path.join(exps["nar"], "config.yml"),
        "--codec-path", codec_dir,
        "--outdir", outdir, "--max-steps", "16",
    ])
    from jatts_tpu.utils.io import read_audio

    wavs = [f for f in os.listdir(os.path.join(outdir, "wav")) if f.endswith(".wav")]
    assert wavs, "no decoded waveforms"
    out, _ = read_audio(os.path.join(outdir, "wav", wavs[0]), 24000)
    assert len(out) > 0 and np.isfinite(out).all()
