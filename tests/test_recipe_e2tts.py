"""E2-TTS recipe path: preprocess -> stats -> tokens -> tts_train with the
frame-budget sampler + EMA -> e2tts_decode with prompt conditioning."""

import os
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import read_csv, write_csv


SR, HOP = 24000, 300


def _make_corpus(root, n=4):
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    phones = ["a", "i", "u", "e", "o"]
    for i in range(n):
        n_frames = int(rng.integers(30, 60))
        t = np.arange(n_frames * HOP) / SR
        wav = (0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t)).astype(np.float32)
        path = os.path.join(root, "wav", f"utt{i}.wav")
        from jatts_tpu.utils.io import write_audio

        write_audio(path, wav, SR)
        rows.append(
            {
                "sample_id": f"utt{i}",
                "spk": "spk1",
                "wav_path": path,
                "start": "",
                "end": "",
                "original_text": "dummy",
                "phonemes": " ".join(rng.choice(phones, int(rng.integers(3, 6)))),
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


@pytest.mark.slow
def test_e2tts_recipe(tmp_path):
    root = str(tmp_path)
    csv_path = _make_corpus(root)
    config = {
        "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP,
        "win_length": None, "num_mels": 12, "fmin": 80, "fmax": 7600,
        "feat_list": ["mel"], "out_feat_type": "mel",
        "model_type": "E2TTS",
        "model_params": {
            "odim": 12, "backbone": "UNetT", "dim": 32, "depth": 2,
            "heads": 2, "ff_mult": 2, "pe_attn_head": 1,
        },
        "trainer_type": "E2TTSTrainer",
        "collater_type": "FastSpeech2Collater",
        "criterions": {},
        "batch_size_per_gpu": 512,   # frame budget -> DynamicBatchSampler
        "max_samples": 4,
        "gradient_accumulate_steps": 1,
        "ema_decay": 0.999,
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 1e-4, "weight_decay": 0.01},
        "grad_norm": 1.0,
        "scheduler": "e2tts_sequentiallr",
        "scheduler_params": {"warmup_steps": 2},
        "train_max_steps": 3,
        "save_interval_steps": 3,
        "eval_interval_steps": 0,
        "log_interval_steps": 1,
        "nfe_step": 2,
        "cfg_strength": 1.0,
        "sway_sampling_coef": -1.0,
    }
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(config, f)

    from jatts_tpu.bin.compute_statistics import main as stats_main
    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.preprocess import main as preprocess_main
    from jatts_tpu.bin.tts_train import main as train_main

    dump = os.path.join(root, "dump")
    _run(preprocess_main, ["p", "--csv", csv_path, "--config", conf_path,
                           "--dumpdir", dump, "--out-csv", csv_path])
    stats = os.path.join(root, "stats.h5")
    _run(stats_main, ["s", "--csv", csv_path, "--config", conf_path, "--out", stats])
    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["t", "--csv", csv_path, "--out", tokens])

    expdir = os.path.join(root, "exp")
    _run(train_main, ["tr", "--train-csv", csv_path, "--dev-csv", csv_path,
                      "--stats", stats, "--token-list", tokens,
                      "--config", conf_path, "--outdir", expdir])
    from jatts_tpu.utils.checkpoint import find_latest_checkpoint, restore_checkpoint

    ckpt = find_latest_checkpoint(expdir)
    assert ckpt is not None
    assert "ema_params" in restore_checkpoint(ckpt)

    # decode with prompts: each test utt prompts with utt0
    rows, fields = read_csv(csv_path, dict_reader=True)
    for r in rows:
        r["prompt_wav_path"] = rows[0]["wav_path"]
        r["prompt_phonemes"] = rows[0]["phonemes"]
    test_csv = os.path.join(root, "test.csv")
    write_csv(rows[:2], test_csv)

    from jatts_tpu.bin.e2tts_decode import main as decode_main

    outdir = os.path.join(root, "decode")
    _run(decode_main, ["d", "--csv", test_csv, "--stats", stats,
                       "--token-list", tokens, "--expdir", expdir,
                       "--config", os.path.join(expdir, "config.yml"),
                       "--outdir", outdir, "--max-frames", "128"])
    mels = [f for f in os.listdir(os.path.join(outdir, "wav")) if f.endswith("_mel.npy")]
    assert len(mels) == 2
    mel = np.load(os.path.join(outdir, "wav", mels[0]))
    assert mel.shape[1] == 12 and np.isfinite(mel).all()
