"""Multi-host TENSOR-PARALLEL checkpoint + resume — the one multi-chip path
round 3 left untested (train/trainer.py then said so explicitly).

Two real `jax.distributed` CPU processes (2 local devices each -> global
dp2 x tp2 mesh, VALL-E AR kernels Megatron-sharded over 'model'):

  1. train 2 steps, save — exercises Trainer._host_fetch's all-gather of
     TP-sharded (non-addressable) leaves before orbax sees them;
  2. fresh 2-process run resumes from the checkpoint to 4 steps —
     exercises the template restore from a sharded state + re-sharding the
     restored host arrays onto the multi-host mesh
     (parallel/mesh.py shard_params_tp make_array_from_callback path);
  3. a single-process run on the same-shape 4-device local mesh trains 4
     steps straight; final params must agree to float noise (identical
     batch every step, SGD, zero dropout).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_tp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(args, n_local, env_extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(phase, steps, outdir):
    port = _free_port()
    procs = [
        _launch(
            ["--outdir", outdir, "--phase", phase, "--steps", str(steps)],
            2,
            {"JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
             "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)},
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
        assert "WORKER_OK" in o, o[-4000:]


@pytest.mark.slow
def test_multihost_tp_save_resume_matches_single(tmp_path):
    out_mh = str(tmp_path / "mh")
    _run_pair("train", 2, out_mh)
    _run_pair("resume", 4, out_mh)

    out_sp = str(tmp_path / "sp")
    p = _launch(["--outdir", out_sp, "--phase", "single", "--steps", "4"], 4, {})
    o = p.communicate(timeout=600)[0]
    assert p.returncode == 0, o[-4000:]

    from jatts_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
    )

    ck_mh = find_latest_checkpoint(out_mh)
    ck_sp = find_latest_checkpoint(out_sp)
    assert ck_mh and ck_mh.endswith("checkpoint-4steps"), ck_mh
    assert ck_sp and ck_sp.endswith("checkpoint-4steps"), ck_sp

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
