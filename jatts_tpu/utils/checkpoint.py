"""Orbax checkpointing with reference-compatible naming.

Checkpoints are directories ``checkpoint-{steps}steps`` under the experiment
outdir (the reference writes ``checkpoint-{steps}steps.pkl`` pickles,
trainers/base.py:85-105; we keep the stem so recipe scripts' latest-checkpoint
discovery by steps works unchanged).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _ckpt_dir(outdir: str, steps: int) -> str:
    return os.path.join(os.path.abspath(outdir), f"checkpoint-{steps}steps")


def _checkpointer():
    """Single-process orbax pool.

    Under multi-host, orbax's default cross-process sync (process_allgather
    over ad-hoc Gloo cliques) deadlocks against in-flight training
    collectives on the CPU/Gloo backend; our checkpoints are host numpy
    (device_get'd replicated state), so each process can act as its own
    single-member pool: process 0 writes, everyone reads.
    """
    import jax

    if jax.process_count() > 1:
        i = jax.process_index()
        opts = ocp.options.MultiprocessingOptions(
            primary_host=i, active_processes={i},
            barrier_sync_key_prefix=f"proc{i}",
        )
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(multiprocessing_options=opts),
            multiprocessing_options=opts,
        )
    return ocp.StandardCheckpointer()


def save_checkpoint(outdir: str, steps: int, state: Dict[str, Any]) -> str:
    """Write an orbax checkpoint. Multi-host: call on EVERY process with the
    same (replicated, device_get'd) state — only process 0 writes."""
    import jax

    path = _ckpt_dir(outdir, steps)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return path  # reference-style rank-0 writing (trainers/base.py)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if hasattr(ckptr, "wait_until_finished"):  # async (single-process) pool
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)  # orbax rejects relative paths
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def find_latest_checkpoint(outdir: str) -> Optional[str]:
    """Latest by step count (reference picks by mtime, run.sh:241)."""
    if not os.path.isdir(outdir):
        return None
    best, best_steps = None, -1
    for name in os.listdir(outdir):
        m = re.fullmatch(r"checkpoint-(\d+)steps", name)
        if m and int(m.group(1)) > best_steps:
            best, best_steps = os.path.join(outdir, name), int(m.group(1))
    return best


def checkpoint_steps(path: str) -> int:
    m = re.search(r"checkpoint-(\d+)steps", path)
    return int(m.group(1)) if m else 0
