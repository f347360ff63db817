"""Bash-level recipe E2E: the actual egs/jsut/tts1/run.sh runs stages 0-5 via
`bash run.sh --stage 0 --stop_stage 5 ...` on a synthetic JSUT-layout corpus
with Julius-format .lab alignments — exercising parse_options.sh overrides,
the stage wiring, and the latest-checkpoint plumbing that the python-level
recipe tests (tests/test_recipe_e2e.py) bypass."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 24000, 300


def _make_jsut_corpus(root, n=6):
    """JSUT layout: basic5000/{transcript_utf8.txt, wav/} + .lab alignments."""
    wavdir = os.path.join(root, "downloads", "jsut", "basic5000", "wav")
    labdir = os.path.join(root, "lab")
    os.makedirs(wavdir, exist_ok=True)
    os.makedirs(labdir, exist_ok=True)
    rng = np.random.default_rng(0)
    phones = ["a", "i", "u", "e", "o", "k", "s", "t"]
    lines = []
    for i in range(n):
        utt = f"UT{i:03d}"
        n_ph = int(rng.integers(4, 8))
        ph = list(rng.choice(phones, n_ph))
        durs = rng.integers(5, 15, n_ph)  # frames per phone
        sil = 0.05
        t0 = sil
        lab = [f"0.0000 {sil:.4f} silB"]
        for p, d in zip(ph, durs):
            t1 = t0 + float(d) * HOP / SR
            lab.append(f"{t0:.4f} {t1:.4f} {p}")
            t0 = t1
        lab.append(f"{t0:.4f} {t0 + sil:.4f} silE")
        with open(os.path.join(labdir, f"{utt}.lab"), "w") as f:
            f.write("\n".join(lab) + "\n")
        n_samp = int(round((t0 + sil) * SR))
        t = np.arange(n_samp) / SR
        f0 = 140 + 25 * np.sin(2 * np.pi * 1.7 * t + i)
        wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / SR)).astype(np.float32)
        write_audio(os.path.join(wavdir, f"{utt}.wav"), wav, SR)
        lines.append(f"{utt}:こんにちは")
    with open(
        os.path.join(root, "downloads", "jsut", "basic5000", "transcript_utf8.txt"),
        "w", encoding="utf-8",
    ) as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(root, "downloads", "jsut"), labdir


TINY_CONF = {
    "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP, "num_mels": 20,
    "fmin": 80, "fmax": 7600,
    "feat_list": ["mel", "pitch", "energy"],
    "out_feat_type": "mel",
    "model_type": "FastSpeech2",
    "model_params": {
        "odim": 20, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
        "dlayers": 1, "dunits": 32, "postnet_layers": 2, "postnet_chans": 8,
        "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
        "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
        "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
    },
    "trainer_type": "FastSpeech2Trainer",
    "collater_type": "FastSpeech2Collater",
    "criterions": {
        "MelLoss": {"_type": "L1Loss"}, "DurationPredictorLoss": {},
        "PitchLoss": {}, "EnergyLoss": {},
    },
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
def test_run_sh_stages_0_to_5(tmp_path):
    root = str(tmp_path)
    db_root, labdir = _make_jsut_corpus(root)

    # sandbox recipe tree: copy the recipe dir, symlink the package + utils
    egs = os.path.join(root, "egs", "jsut", "tts1")
    shutil.copytree(os.path.join(REPO, "egs", "jsut", "tts1"), egs)
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    with open(os.path.join(egs, "conf", "tiny.yaml"), "w") as f:
        yaml.dump(TINY_CONF, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # OVERWRITE (do not append!): evicting any sitecustomize dir from
    # PYTHONPATH is what makes JAX_PLATFORMS=cpu actually effective in the
    # child stages — a TPU-registering sitecustomize pins its own platform
    # list at interpreter start and the env var alone then HANGS backend
    # init (CLAUDE.md quirk; verified)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "6",
         "--conf", "conf/tiny.yaml", "--db_root", db_root,
         "--labdir", labdir, "--n_dev", "2", "--n_test", "2",
         "--n_jobs", "2", "--vocoder", "griffin_lim",
         "--serving_buckets", "16", "--serving_platforms", "cpu"],
        cwd=egs, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    # stage artifacts
    assert os.path.exists(os.path.join(egs, "data", "train.csv"))
    assert os.path.exists(os.path.join(egs, "dump", "stats.h5"))
    assert os.path.exists(os.path.join(egs, "dump", "tokens.txt"))
    expdir = os.path.join(egs, "exp", "tiny")
    ckpts = [d for d in os.listdir(expdir) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(expdir)
    wavs = [f for f in os.listdir(os.path.join(expdir, "results", "wav"))
            if f.endswith(".wav")]
    assert len(wavs) == 2, wavs
    assert os.path.exists(os.path.join(expdir, "results", "eval.csv"))

    # stage 6: AOT serving bundle loads and synthesizes
    from jatts_tpu.serving import load_bundle

    bundle = load_bundle(os.path.join(expdir, "serving.npz"))
    res = bundle.synthesize([[2, 3, 4]], seed=0)
    assert res[0]["mel"].shape[1] == TINY_CONF["num_mels"]
    assert np.isfinite(res[0]["mel"]).all()
