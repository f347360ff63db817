"""Bash-level JVS (multi-speaker) recipe E2E: the actual egs/jvs/tts1/run.sh
runs stages 0-5 via `bash run.sh ...` on a synthetic JVS-layout corpus with
Julius .lab durations and a tiny real-grammar speechbrain ECAPA checkpoint —
exercising the multi-speaker path end-to-end through the shell layer:
per-speaker f0 ranges, native-JAX spkemb extraction in preprocess, spkemb
conditioning in training AND decode, and objective evaluation (reference
analog: egs/jvs/tts1/run.sh)."""

import os
import shutil
import subprocess

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR, HOP = 24000, 300
SPK_DIM = 24  # lin_neurons of the tiny ECAPA below


def _make_jvs(root, n_spk=2, n_utt=6):
    """jvs_ver1 layout: jvsNNN/parallel100/{transcripts_utf8.txt,
    wav24kHz16bit/}."""
    rng = np.random.default_rng(0)
    utts = []
    for s in range(n_spk):
        spk = f"jvs{s + 1:03d}"
        d = os.path.join(root, spk, "parallel100")
        os.makedirs(os.path.join(d, "wav24kHz16bit"), exist_ok=True)
        with open(os.path.join(d, "transcripts_utf8.txt"), "w",
                  encoding="utf-8") as f:
            for u in range(n_utt):
                utt = f"VOICEACTRESS100_{u + 1:03d}"
                f.write(f"{utt}:こんにちは\n")
                dur_s = float(rng.uniform(0.7, 1.1))
                n_samp = int(dur_s * SR)
                t = np.arange(n_samp) / SR
                f0 = (110 + 40 * s) + 15 * np.sin(2 * np.pi * 2.0 * t + u)
                wav = (0.3 * np.sin(2 * np.pi * np.cumsum(f0) / SR)).astype(
                    np.float32
                )
                write_audio(
                    os.path.join(d, "wav24kHz16bit", f"{utt}.wav"), wav, SR
                )
                utts.append((f"{spk}_{utt}", dur_s))
    return utts


def _make_labs(labdir, utts, seed=0):
    """Julius-format .lab per utterance: silB + phones + silE, within dur."""
    rng = np.random.default_rng(seed)
    os.makedirs(labdir, exist_ok=True)
    phones = ["a", "i", "u", "e", "o", "k", "s"]
    for name, dur_s in utts:
        a, b = 0.08, dur_s - 0.08
        n_ph = int(rng.integers(3, 6))
        cuts = np.sort(rng.uniform(a + 0.02, b - 0.02, n_ph - 1))
        bounds = [a, *cuts.tolist(), b]
        with open(os.path.join(labdir, f"{name}.lab"), "w") as f:
            f.write(f"0.0000000 {a:.7f} silB\n")
            for i in range(n_ph):
                f.write(
                    f"{bounds[i]:.7f} {bounds[i + 1]:.7f} "
                    f"{rng.choice(phones)}\n"
                )
            f.write(f"{b:.7f} {dur_s:.7f} silE\n")


def _make_ecapa_ckpt(path):
    """Tiny speechbrain-grammar ECAPA embedding_model.ckpt (random weights);
    features/ecapa.py infers the architecture from the state dict."""
    import sys

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_replica import SBEcapaTdnn

    tm = SBEcapaTdnn(
        n_mels=80, channels=(32, 32, 32, 32, 96),
        kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
        attn_ch=16, res2net_scale=4, se_ch=16, lin_neurons=SPK_DIM,
    ).eval()
    g = torch.Generator().manual_seed(0)
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    torch.save(sd, path)
    return path


def _tiny_conf(spkemb_model_path):
    return {
        "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP,
        "num_mels": 20, "fmin": 80, "fmax": 7600,
        "feat_list": ["mel", "pitch", "energy", "spkemb"],
        "out_feat_type": "mel",
        "spkemb_model_path": spkemb_model_path,
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": 20, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
            "dlayers": 1, "dunits": 32, "postnet_layers": 2,
            "postnet_chans": 8, "duration_predictor_chans": 8,
            "pitch_predictor_chans": 8, "pitch_predictor_layers": 2,
            "energy_predictor_chans": 8, "conformer_enc_kernel_size": 7,
            "conformer_dec_kernel_size": 7,
            "spk_embed_dim": SPK_DIM, "spk_embed_integration_type": "add",
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
def test_run_sh_jvs_stages_0_to_5(tmp_path):
    root = str(tmp_path)
    db_root = os.path.join(root, "jvs_ver1")
    utts = _make_jvs(db_root)
    labdir = os.path.join(root, "lab")
    _make_labs(labdir, utts)
    ckpt = _make_ecapa_ckpt(os.path.join(root, "embedding_model.ckpt"))

    egs = os.path.join(root, "egs", "jvs", "tts1")
    shutil.copytree(os.path.join(REPO, "egs", "jvs", "tts1"), egs)
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    with open(os.path.join(egs, "conf", "tiny.yaml"), "w") as f:
        yaml.dump(_tiny_conf(ckpt), f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # OVERWRITE (not append): evicting any sitecustomize dir from PYTHONPATH
    # is what makes JAX_PLATFORMS=cpu effective in child stages (CLAUDE.md)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "5",
         "--conf", "conf/tiny.yaml", "--db_root", db_root,
         "--labdir", labdir, "--n_jobs", "2", "--vocoder", "griffin_lim",
         "--dev_per_spk", "1", "--test_per_spk", "1"],
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
    assert len(wavs) == 2, os.listdir(wavdir)  # 2 speakers x 1 test utt
    assert os.path.exists(os.path.join(expdir, "results", "eval.csv"))
