"""Executed multi-host path: two real `jax.distributed` CPU processes run
bin/tts_train.py --multihost (Gloo collectives across processes, 2 local
devices each -> a 4-device global mesh), and the final parameters agree with
a single-process run on the same 4-device mesh.

The global batch under multi-host is a row permutation of the single-process
batch (each host contributes its strided row slice,
parallel/mesh.py:_put_global), so with dropout disabled the mean loss and
gradients are permutation-invariant and the runs must match to float noise.

Reference analog: egs/hificaptain_jp_female/tts2/run_e2tts_multinode.sh
(rank discovery + MASTER_ADDR env) -> here JAX_COORDINATOR_ADDRESS/
JAX_NUM_PROCESSES/JAX_PROCESS_ID + jax.distributed.initialize.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from test_recipe_e2e import _make_corpus, _run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # env alone insufficient (sitecustomize)
sys.path.insert(0, {repo!r})
from jatts_tpu.bin.tts_train import main
sys.argv = ["tts_train"] + sys.argv[1:]
main()
"""


def _config(root):
    return {
        "sampling_rate": 24000,
        "fft_size": 2048,
        "hop_size": 300,
        "num_mels": 20,
        "fmin": 80,
        "fmax": 7600,
        "feat_list": ["mel", "pitch", "energy"],
        "out_feat_type": "mel",
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": 20, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
            "dlayers": 1, "dunits": 32, "postnet_layers": 2, "postnet_chans": 8,
            "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
            "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
            "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
            # zero dropout: batch-row permutation must not change gradients
            "transformer_enc_dropout_rate": 0.0,
            "transformer_enc_positional_dropout_rate": 0.0,
            "transformer_enc_attn_dropout_rate": 0.0,
            "transformer_dec_dropout_rate": 0.0,
            "transformer_dec_positional_dropout_rate": 0.0,
            "transformer_dec_attn_dropout_rate": 0.0,
            "duration_predictor_dropout_rate": 0.0,
            "pitch_predictor_dropout": 0.0, "energy_predictor_dropout": 0.0,
            "postnet_dropout_rate": 0.0,
        },
        "trainer_type": "FastSpeech2Trainer",
        "collater_type": "FastSpeech2Collater",
        "criterions": {
            "MelLoss": {"_type": "L1Loss"},
            "DurationPredictorLoss": {},
            "PitchLoss": {},
            "EnergyLoss": {},
        },
        "batch_size": 4,
        "optimizer_type": "SGD",
        "optimizer_params": {"lr": 0.01},
        "grad_norm": 1.0,
        "scheduler": "warmuplr",
        "scheduler_params": {"warmup_steps": 4},
        "train_max_steps": 3,
        "save_interval_steps": 1000,
        "eval_interval_steps": 0,
        "log_interval_steps": 1000,
    }


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(worker_py, train_args, outdir, n_local, env_extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, worker_py, *train_args, "--outdir", outdir],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_multihost_two_processes_match_single(tmp_path):
    root = str(tmp_path)
    csv_path = _make_corpus(root)
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(_config(root), f)

    # stages 1-2 once, in-process
    from jatts_tpu.bin.compute_statistics import main as stats_main
    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.preprocess import main as preprocess_main

    _run(preprocess_main, ["p", "--csv", csv_path, "--config", conf_path,
                           "--dumpdir", os.path.join(root, "dump"),
                           "--out-csv", csv_path])
    stats = os.path.join(root, "stats.h5")
    _run(stats_main, ["s", "--csv", csv_path, "--config", conf_path, "--out", stats])
    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["t", "--csv", csv_path, "--out", tokens])

    worker_py = os.path.join(root, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER.format(repo=REPO))
    train_args = [
        "--train-csv", csv_path, "--dev-csv", csv_path, "--stats", stats,
        "--token-list", tokens, "--config", conf_path, "--seed", "0",
    ]

    # ---- 2-process distributed run (2 local devices each) ----
    port = _free_port()
    out_mh = os.path.join(root, "exp_mh")
    procs = [
        _launch(
            worker_py, train_args + ["--multihost"], out_mh, 2,
            {"JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
             "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)},
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]

    # ---- single-process run, same 4-device global mesh ----
    out_sp = os.path.join(root, "exp_sp")
    p = _launch(worker_py, train_args, out_sp, 4, {})
    o = p.communicate(timeout=600)[0]
    assert p.returncode == 0, o[-4000:]

    from jatts_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
    )

    ck_mh = find_latest_checkpoint(out_mh)
    ck_sp = find_latest_checkpoint(out_sp)
    assert ck_mh and ck_mh.endswith("checkpoint-3steps")
    assert ck_sp and ck_sp.endswith("checkpoint-3steps")

    import jax

    mh = restore_checkpoint(ck_mh)
    sp = restore_checkpoint(ck_sp)
    leaves_mh = jax.tree_util.tree_leaves(mh["params"])
    leaves_sp = jax.tree_util.tree_leaves(sp["params"])
    assert len(leaves_mh) == len(leaves_sp)
    for a, b in zip(leaves_mh, leaves_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
