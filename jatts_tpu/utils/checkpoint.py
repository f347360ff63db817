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
    # single process: a SYNCHRONOUS checkpointer. StandardCheckpointer is an
    # AsyncCheckpointer whose finalize (ArrayMetadata validation + tmp-dir
    # rename) runs on a background thread behind a barrier_sync_fn and a
    # thread-pool executor — observed to stall INDEFINITELY (intermittently,
    # under CPU contention) after "Handler Commit operations completed",
    # leaving only the .orbax-checkpoint-tmp dir. save_checkpoint blocks on
    # wait_until_finished immediately anyway, so async buys nothing here.
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


_SAVE_SEQ = [0]  # cross-call barrier id; all ranks save in lockstep


def _save_barrier() -> None:
    """Rendezvous after a rank-0 write: without this, ranks != 0 race ahead
    into the next step's Gloo collectives while rank 0 blocks on the
    synchronous write — for a slow save the skew exceeds Gloo's fixed
    connect/join timeout and the peers' in-flight collectives die."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        _SAVE_SEQ[0] += 1
        client.wait_at_barrier(
            f"jatts_tpu_ckpt_{_SAVE_SEQ[0]}", timeout_in_ms=1_200_000
        )


def save_checkpoint(outdir: str, steps: int, state: Dict[str, Any]) -> str:
    """Write an orbax checkpoint. Multi-host: call on EVERY process with the
    same (replicated, device_get'd) state — only process 0 writes."""
    import jax

    path = _ckpt_dir(outdir, steps)
    if jax.process_count() > 1 and jax.process_index() != 0:
        _save_barrier()  # reference-style rank-0 writing (trainers/base.py)
        return path
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if hasattr(ckptr, "wait_until_finished"):  # async (single-process) pool
        ckptr.wait_until_finished()
    if jax.process_count() > 1:
        _save_barrier()
    return path


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)  # orbax rejects relative paths
    ckptr = _checkpointer()
    if template is not None:
        # plain Checkpointer has no `target=` sugar (that is
        # StandardCheckpointer-only); the template goes through the args API
        return ckptr.restore(path, args=ocp.args.StandardRestore(template))
    return ckptr.restore(path)


def checkpoint_top_level_keys(path: str) -> Optional[set]:
    """Top-level tree keys of an orbax checkpoint, from its _METADATA file
    (no tensor reads). None if the metadata is absent/unparseable — callers
    should then fall back to assuming their own structure."""
    import json

    meta_path = os.path.join(os.path.abspath(path), "_METADATA")
    try:
        with open(meta_path) as f:
            tree = json.load(f)["tree_metadata"]
        keys = set()
        for v in tree.values():
            keys.add(v["key_metadata"][0]["key"])
        return keys
    except Exception:  # noqa: BLE001 — metadata layout varies across versions
        return None


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
