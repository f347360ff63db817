"""Bash-level E2-TTS recipe E2E: the actual egs/hificaptain_jp_female/tts2/
run_e2tts.sh runs stages 0-5 via `bash run_e2tts.sh ...` on a synthetic
HFC-layout corpus — exercising parse_options.sh overrides, silence-trim data
prep with eval prompts, frame-budget training, prompt-conditioned CFG decode
with the Griffin-Lim fallback, and objective evaluation (reference analog:
egs/hificaptain_jp_female/tts2/run_e2tts.sh)."""

import os
import shutil
import subprocess

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 24000, 300


def _make_hfc_corpus(root):
    os.makedirs(os.path.join(root, "text"), exist_ok=True)
    rng = np.random.default_rng(0)
    sets = {"train_parallel": 4, "train_non_parallel": 2, "dev": 2, "eval": 2}
    k = 0
    for _set, n in sets.items():
        wavdir = os.path.join(root, "wav", _set)
        os.makedirs(wavdir, exist_ok=True)
        with open(os.path.join(root, "text", f"{_set}.txt"), "w",
                  encoding="utf-8") as f:
            for _ in range(n):
                utt = f"UTT_{k:04d}"
                k += 1
                dur_s = float(rng.uniform(0.7, 1.2))
                n_samp = int(dur_s * SR)
                t = np.arange(n_samp) / SR
                f0 = 130 + 20 * np.sin(2 * np.pi * 2.0 * t + k)
                wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / SR)).astype(
                    np.float32
                )
                # silence margins so trim_silence has something to find
                wav[: int(0.05 * SR)] = 0.0
                wav[-int(0.05 * SR):] = 0.0
                write_audio(os.path.join(wavdir, f"{utt}.wav"), wav, SR)
                f.write(f"{utt} ありがとう\n")
    return root


TINY_CONF = {
    "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP,
    "win_length": None, "num_mels": 20, "fmin": 80, "fmax": 7600,
    "feat_list": ["mel"], "out_feat_type": "mel",
    "model_type": "E2TTS",
    "model_params": {
        "odim": 20, "backbone": "UNetT", "dim": 32, "depth": 2,
        "heads": 2, "ff_mult": 2, "pe_attn_head": 1,
    },
    "trainer_type": "E2TTSTrainer",
    "collater_type": "FastSpeech2Collater",
    "criterions": {},
    "batch_size_per_gpu": 512,  # frame budget -> DynamicBatchSampler
    "max_samples": 4,
    "gradient_accumulate_steps": 1,
    "ema_decay": 0.999,
    "optimizer_type": "AdamW",
    "optimizer_params": {"lr": 1e-4, "weight_decay": 0.01},
    "grad_norm": 1.0,
    "scheduler": "e2tts_sequentiallr",
    "scheduler_params": {"warmup_steps": 2},
    "train_max_steps": 2,
    "save_interval_steps": 2,
    "eval_interval_steps": 0,
    "log_interval_steps": 1,
    "nfe_step": 2,
    "cfg_strength": 1.0,
    "sway_sampling_coef": -1.0,
}


@pytest.mark.slow
def test_run_sh_e2tts_stages_0_to_5(tmp_path):
    root = str(tmp_path)
    db_root = _make_hfc_corpus(os.path.join(root, "db"))

    egs = os.path.join(root, "egs", "hificaptain_jp_female", "tts2")
    shutil.copytree(
        os.path.join(REPO, "egs", "hificaptain_jp_female", "tts2"), egs
    )
    # the tts2 data_prep imports trim_silence from the jsut tts2 local dir
    jsut2 = os.path.join(root, "egs", "jsut", "tts2")
    os.makedirs(os.path.dirname(jsut2), exist_ok=True)
    shutil.copytree(os.path.join(REPO, "egs", "jsut", "tts2"), jsut2)
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    with open(os.path.join(egs, "conf", "tiny_e2tts.yaml"), "w") as f:
        yaml.dump(TINY_CONF, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # OVERWRITE (not append): evicting any sitecustomize dir from PYTHONPATH
    # is what makes JAX_PLATFORMS=cpu effective in child stages (CLAUDE.md)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        ["bash", "run_e2tts.sh", "--stage", "0", "--stop_stage", "5",
         "--conf", "conf/tiny_e2tts.yaml", "--db_root", db_root,
         "--fs", str(SR), "--vocoder", "griffin_lim",
         "--decode_max_frames", "192"],
        cwd=egs, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    assert os.path.exists(os.path.join(egs, "data", "train.csv"))
    assert os.path.exists(os.path.join(egs, "dump", "stats.h5"))
    expdir = os.path.join(egs, "exp", "tiny_e2tts")
    ckpts = [d for d in os.listdir(expdir) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(expdir)
    wavdir = os.path.join(expdir, "results", "wav")
    wavs = [f for f in os.listdir(wavdir) if f.endswith(".wav")]
    assert len(wavs) == 2, os.listdir(wavdir)
    assert os.path.exists(os.path.join(expdir, "results", "eval.csv"))
