"""Bash-level implicit-alignment recipe E2E: the actual egs/jsut/tts2/run.sh
runs stages 0-5 via `bash run.sh ...` on a synthetic JSUT-layout corpus —
exercising the MAS path through the shell layer: silence-trim data prep
(no .lab alignments), MatchaTTS_MAS training with the scheduled alignment
losses, CFM ODE decode with the Griffin-Lim fallback, and objective
evaluation (reference analog: egs/jsut/tts2/run.sh)."""

import os
import shutil
import subprocess

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 24000, 300


def _make_jsut_corpus(root, n=6):
    """JSUT layout: basic5000/{transcript_utf8.txt, wav/} — no .lab files
    (tts2 derives start/end by energy trim, alignment is implicit)."""
    wavdir = os.path.join(root, "downloads", "jsut", "basic5000", "wav")
    os.makedirs(wavdir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        utt = f"UT{i:03d}"
        dur_s = float(rng.uniform(0.7, 1.2))
        n_samp = int(dur_s * SR)
        t = np.arange(n_samp) / SR
        f0 = 140 + 25 * np.sin(2 * np.pi * 1.7 * t + i)
        wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / SR)).astype(np.float32)
        wav[: int(0.05 * SR)] = 0.0
        wav[-int(0.05 * SR):] = 0.0
        write_audio(os.path.join(wavdir, f"{utt}.wav"), wav, SR)
        lines.append(f"{utt}:こんにちは")
    with open(
        os.path.join(root, "downloads", "jsut", "basic5000",
                     "transcript_utf8.txt"),
        "w", encoding="utf-8",
    ) as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(root, "downloads", "jsut")


TINY_CONF = {
    "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP, "num_mels": 20,
    "fmin": 80, "fmax": 7600,
    "feat_list": ["mel"],
    "out_feat_type": "mel",
    "model_type": "MatchaTTS_MAS",
    "model_params": {
        "odim": 20, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
        "duration_predictor_chans": 8, "decoder_channels": [16, 16],
        "decoder_attention_head_dim": 8, "conformer_enc_kernel_size": 7,
    },
    "trainer_type": "MatchaTTSTrainer",
    "collater_type": "FastSpeech2Collater",
    "criterions": {
        "CFMLoss": {}, "EncoderPriorLoss": {}, "ForwardSumLoss": {},
        "DurationPredictorLoss": {},
    },
    "lambda_align": 2.0,
    "dp_train_start_steps": 1,
    "bin_loss_start_steps": 1,
    "temperature": 0.667,
    "ode_steps": 2,
    "batch_size": 2,
    "optimizer_type": "Adam", "optimizer_params": {"lr": 0.001},
    "grad_norm": 1.0, "scheduler": "warmuplr",
    "scheduler_params": {"warmup_steps": 4},
    "train_max_steps": 2, "save_interval_steps": 2,
    "eval_interval_steps": 0, "log_interval_steps": 1,
    "eval_max_frames": 128, "num_save_intermediate_results": 1,
    "max_frames": 256,
}


@pytest.mark.slow
def test_run_sh_mas_stages_0_to_5(tmp_path):
    root = str(tmp_path)
    db_root = _make_jsut_corpus(root)

    egs = os.path.join(root, "egs", "jsut", "tts2")
    shutil.copytree(os.path.join(REPO, "egs", "jsut", "tts2"), egs)
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    with open(os.path.join(egs, "conf", "tiny.yaml"), "w") as f:
        yaml.dump(TINY_CONF, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # OVERWRITE (not append): evicting any sitecustomize dir from PYTHONPATH
    # is what makes JAX_PLATFORMS=cpu effective in child stages (CLAUDE.md)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "5",
         "--conf", "conf/tiny.yaml", "--db_root", db_root,
         "--n_dev", "2", "--n_test", "2", "--n_jobs", "2",
         "--vocoder", "griffin_lim"],
        cwd=egs, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    assert os.path.exists(os.path.join(egs, "data", "train.csv"))
    assert os.path.exists(os.path.join(egs, "dump", "stats.h5"))
    expdir = os.path.join(egs, "exp", "tiny")
    ckpts = [d for d in os.listdir(expdir) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(expdir)
    wavdir = os.path.join(expdir, "results", "wav")
    wavs = [f for f in os.listdir(wavdir) if f.endswith(".wav")]
    assert len(wavs) == 2, os.listdir(wavdir)
    assert os.path.exists(os.path.join(expdir, "results", "eval.csv"))
