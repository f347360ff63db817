"""Bash-level VALL-E recipe E2E: the actual egs/hificaptain_jp_female/tts3/
run.sh runs stages 0-5 via `bash run.sh ...` on a synthetic corpus with a
tiny real EnCodec — exercising parse_options.sh overrides, the stage-0 data
prep wiring (random train-utterance prompts), EnCodec preprocessing, AR+NAR
training, and two-stage ttslm decode to waveforms. The python-level test
(tests/test_recipe_valle.py) calls the bin mains directly and bypasses this
shell layer (reference analog: egs/hificaptain_jp_female/tts3/run.sh)."""

import os
import shutil
import subprocess

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 24000


def _make_corpus(root, n=8):
    wavdir = os.path.join(root, "db", "wav")
    os.makedirs(wavdir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        utt = f"utt{i:03d}"
        ns = int(rng.integers(6000, 12000))
        wav = (0.1 * rng.normal(size=ns)).astype(np.float32)
        write_audio(os.path.join(wavdir, f"{utt}.wav"), wav, SR)
        lines.append(f"{utt}:こんにちは")
    transcript = os.path.join(root, "db", "transcript.txt")
    with open(transcript, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(root, "db"), transcript


def _conf(model_type, n_resp_levels, codec_dir):
    return {
        "sampling_rate": SR,
        "feat_list": ["encodec"],
        "out_feat_type": "encodec",
        "prompt_strategy": "given",
        "codec_path": codec_dir,
        "model_type": model_type,
        "model_params": {
            "n_tokens": 1024, "d_model": 32, "n_heads": 2, "n_layers": 2,
            "n_prom_levels": 8, "n_resp_levels": n_resp_levels,
            "prompt_max_frame_length": 24,
        },
        "trainer_type": "VALLETrainer",
        "collater_type": "VALLECollater",
        "criterions": {},
        "batch_size": 2,
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
def test_run_sh_valle_stages_0_to_5(tmp_path, tmp_path_factory):
    from tiny_models import make_tiny_encodec

    codec_dir = make_tiny_encodec(str(tmp_path_factory.mktemp("codec")))
    root = str(tmp_path)
    db_root, transcript = _make_corpus(root)

    # sandbox recipe tree: copy the recipe dir, symlink the package + utils
    egs = os.path.join(root, "egs", "hificaptain_jp_female", "tts3")
    shutil.copytree(
        os.path.join(REPO, "egs", "hificaptain_jp_female", "tts3"), egs
    )
    os.symlink(os.path.join(REPO, "jatts_tpu"), os.path.join(root, "jatts_tpu"))
    os.symlink(os.path.join(REPO, "utils"), os.path.join(root, "utils"))
    for name, model_type, levels in (("ar", "VALLEAR", 1), ("nar", "VALLENAR", 7)):
        with open(os.path.join(egs, "conf", f"tiny_{name}.yaml"), "w") as f:
            yaml.dump(_conf(model_type, levels, codec_dir), f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # OVERWRITE (not append): evicting any sitecustomize dir from PYTHONPATH
    # is what makes JAX_PLATFORMS=cpu effective in child stages (CLAUDE.md)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "5",
         "--ar_conf", "conf/tiny_ar.yaml", "--nar_conf", "conf/tiny_nar.yaml",
         "--db_root", db_root, "--transcript", transcript,
         "--n_dev", "2", "--n_test", "2", "--codec_path", codec_dir,
         "--decode_max_steps", "16"],
        cwd=egs, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    # stage artifacts
    assert os.path.exists(os.path.join(egs, "data", "train.csv"))
    assert os.path.exists(os.path.join(egs, "dump", "tokens.txt"))
    for exp in ("tiny_ar", "tiny_nar"):
        expdir = os.path.join(egs, "exp", exp)
        ckpts = [d for d in os.listdir(expdir) if d.startswith("checkpoint-")]
        assert ckpts, os.listdir(expdir)
    wavdir = os.path.join(egs, "exp", "tiny_ar", "results", "wav")
    wavs = [f for f in os.listdir(wavdir) if f.endswith(".wav")]
    assert len(wavs) == 2, wavs
    from jatts_tpu.utils.io import read_audio

    out, _ = read_audio(os.path.join(wavdir, wavs[0]), SR)
    assert len(out) > 0 and np.isfinite(out).all()
