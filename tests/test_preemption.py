"""Preemption handling: SIGTERM mid-training must save a resumable final
checkpoint.

TPU pods (and k8s/GCE maintenance) deliver SIGTERM on eviction; the default
handler kills the process without unwinding ``finally``, so the reference's
try/finally last-checkpoint save (reference bin/tts_train.py:401-408) silently
loses progress under real preemption. Our tts_train installs a SIGTERM ->
SystemExit handler so the save runs (SURVEY.md §5.3).
"""

import os
import signal
import time

import pytest
import yaml

from test_multihost import WORKER, _config, _launch, REPO  # noqa: F401
from test_recipe_e2e import _make_corpus, _run


@pytest.mark.slow
def test_sigterm_saves_final_checkpoint(tmp_path):
    root = str(tmp_path)
    csv_path = _make_corpus(root)
    cfg = _config(root)
    cfg["train_max_steps"] = 1_000_000  # effectively infinite: must be killed
    cfg["save_interval_steps"] = 5      # readiness signal for the test
    cfg["log_interval_steps"] = 10_000  # keep the child's stdout pipe small
    cfg["eval_interval_steps"] = 0
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(cfg, f)

    from jatts_tpu.bin.compute_statistics import main as stats_main
    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.preprocess import main as preprocess_main

    _run(preprocess_main, ["p", "--csv", csv_path, "--config", conf_path,
                           "--dumpdir", os.path.join(root, "dump"),
                           "--out-csv", csv_path])
    stats = os.path.join(root, "stats.h5")
    _run(stats_main, ["s", "--csv", csv_path, "--config", conf_path,
                      "--out", stats])
    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["t", "--csv", csv_path, "--out", tokens])

    worker_py = os.path.join(root, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER.format(repo=REPO))
    outdir = os.path.join(root, "exp")
    p = _launch(
        worker_py,
        ["--train-csv", csv_path, "--dev-csv", csv_path, "--stats", stats,
         "--token-list", tokens, "--config", conf_path, "--seed", "0"],
        outdir, 2, {},
        # (the child inherits JAX_COMPILATION_CACHE_DIR=tests/.jax_cache from
        # conftest — the user-level default cache may hold AOT entries
        # compiled on another machine, whose load-fail/recompile churn would
        # push the first step past this test's deadline)
    )

    from jatts_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
    )

    # wait for the first interval checkpoint = training is genuinely underway.
    # Generous deadline: a fresh host cold-compiles the child's programs into
    # its (local-only, gitignored) suite cache before the first step —
    # observed ~300 s on one host, and >900 s when the machine was ALSO
    # busy tracing large HLOs in another process; the loop exits the moment
    # the checkpoint exists, so fast machines pay nothing.
    deadline = time.time() + 1800
    try:
        while find_latest_checkpoint(outdir) is None:
            assert p.poll() is None, p.communicate()[0][-4000:]
            if time.time() >= deadline:
                # include the child's output so a timeout is diagnosable
                p.kill()
                out = p.communicate()[0]
                raise AssertionError(
                    f"no interval checkpoint within 1800s; child output tail:\n"
                    f"{out[-4000:]}"
                )
            time.sleep(0.5)
        p.send_signal(signal.SIGTERM)
        out = p.communicate(timeout=120)[0]
    finally:
        if p.poll() is None:
            p.kill()

    # handler converted SIGTERM to SystemExit(143); a raw signal death would
    # be returncode -15 and would NOT have written the final checkpoint
    assert p.returncode == 143, out[-4000:]
    assert "saved final checkpoint" in out, out[-4000:]

    ck = find_latest_checkpoint(outdir)
    assert ck is not None
    state = restore_checkpoint(ck)
    assert state["steps"] >= 5 and "params" in state and "opt_state" in state
