"""Device mesh + sharding helpers.

TPU-native equivalent of the reference's entire distributed stack
(SURVEY.md §2.9/§5.8): where the reference uses torch DDP + NCCL env
rendezvous + DistributedSampler (jatts/bin/tts_train.py:126-171,238-253) and
HF Accelerate for E2-TTS, we use ONE ``jax.sharding.Mesh`` and
``NamedSharding``: the batch axis is sharded over ``"data"``, parameters are
replicated, and XLA inserts the gradient all-reduce (psum over ICI/DCN)
automatically inside the jitted train step. Multi-host: call
``jax.distributed.initialize()`` before ``get_mesh()`` and shard the csv by
``jax.process_index()`` (data/batcher handles per-host slicing).

Axes:
    data  — data parallel (default: all devices)
    model — reserved for tensor-parallel sharding of the larger LM-style
            models (VALL-E); 1 by default.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    mesh_devices = mesh_utils.create_device_mesh((n_data, n_model), devices=devices[: n_data * n_model])
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Mesh):
    """Replicate a host pytree onto a (possibly multi-host) mesh.

    Multi-process: ``jax.device_put`` onto a non-addressable sharding does a
    cross-host broadcast whose Gloo connect can time out while peers are
    still compiling (init skew is minutes on slow hosts); every host already
    holds the same values (same-seed init / same restored checkpoint), so
    assemble the global array from process-local data — no communication.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )


def _put_global(v: np.ndarray, sharding: NamedSharding, batch_axis: int):
    """Place one batch array on the (possibly multi-host) mesh.

    Single-process: plain device_put. Multi-process: every host holds the
    IDENTICAL full batch (same csv + same sampler seed — see
    bin/tts_train.py); each host contributes its strided row slice and the
    global array is assembled with make_array_from_process_local_data.
    The global batch is therefore a row permutation of the full batch —
    loss means are permutation-invariant. This replaces the reference's
    DistributedSampler + DDP scheme (SURVEY.md §5.8) while guaranteeing
    every host dispatches the same program with the same global shapes
    (per-host batch lists with per-host pad lengths would deadlock SPMD
    collectives)."""
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    proc, nproc = jax.process_index(), jax.process_count()
    idx = [slice(None)] * v.ndim
    idx[batch_axis] = slice(proc, None, nproc)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(v[tuple(idx)])
    )


def _seq_shardable(k: str, v: np.ndarray, time_axis: int, n_model: int) -> bool:
    """True when a batch entry's time axis can be sharded over 'model'
    (sequence parallelism): per-sample scalars ([B] lens etc.) and
    time lengths not divisible by the axis size stay data-sharded only."""
    return (
        n_model > 1
        and v.ndim > time_axis
        and v.shape[time_axis] % n_model == 0
        and not k.endswith("lens")
    )


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, seq_parallel: bool = False
) -> Dict[str, Any]:
    """Move a numpy batch onto the mesh, batch axis over 'data'.

    Non-array entries (utt_ids etc.) are passed through untouched.
    Requires batch size divisible by the data-axis size (the bucketed
    batcher guarantees this when batch_size % n_data == 0).

    ``seq_parallel``: additionally shard each entry's TIME axis (dim 1)
    over 'model' — Megatron-style sequence parallelism on the tensor-
    parallel axis. Activations [B, T, D] then live (data, model)-sharded,
    scaling activation memory past one chip's HBM for long-sequence
    models (E2-TTS frame budgets); XLA/GSPMD inserts the K/V all-gathers
    for attention and halo exchanges for time convs. The reference has no
    sequence-parallel analog (its DDP replicates full activations).
    """
    n_model = mesh.shape.get("model", 1)
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            sh = sharding
            if seq_parallel and _seq_shardable(k, v, 1, n_model):
                sh = NamedSharding(mesh, P("data", "model"))
            out[k] = _put_global(v, sh, 0)
        else:
            out[k] = v
    return out


def shard_stacked_batch(
    batch: Dict[str, Any], mesh: Mesh, seq_parallel: bool = False
) -> Dict[str, Any]:
    """Like :func:`shard_batch` for K stacked batches [K, B, ...]: the scan
    axis (leading) is replicated, the batch axis (second) sharded over
    'data' (and the time axis over 'model' when ``seq_parallel``). Used by
    the trainer's steps_per_execution scan path."""
    n_model = mesh.shape.get("model", 1)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 2:
            spec = P(None, "data")
            if seq_parallel and _seq_shardable(k, v, 2, n_model):
                spec = P(None, "data", "model")
            out[k] = _put_global(v, NamedSharding(mesh, spec), 1)
        else:
            out[k] = v
    return out


def shard_params_tp(params, mesh: Mesh, min_size: int = 2**16):
    """Tensor-parallel parameter sharding over the 'model' axis.

    Large 2-D kernels get their biggest divisible dimension sharded over
    'model' (Megatron-style; XLA/GSPMD inserts the all-gathers /
    reduce-scatters), everything else is replicated. This is how the larger
    LM-style models (VALL-E, E2-TTS) scale past one chip's HBM — the
    reference has no TP at all (SURVEY.md §2.9).
    """
    n_model = mesh.shape["model"]

    def spec_for(x) -> P:
        if n_model == 1 or x.ndim < 2 or x.size < min_size:
            return P()
        # prefer sharding the output dim, else the input dim
        if x.shape[-1] % n_model == 0:
            return P(*([None] * (x.ndim - 1)), "model")
        if x.shape[-2] % n_model == 0:
            return P(*([None] * (x.ndim - 2)), "model", None)
        return P()

    multi = jax.process_count() > 1

    def place(x):
        sh = NamedSharding(mesh, spec_for(x))
        if not multi:
            return jax.device_put(x, sh)
        # Multi-process: device_put onto a non-addressable sharding is a
        # cross-host transfer (Gloo connect can time out under compile skew
        # — same reason replicate_tree avoids it). Every host already holds
        # the full identical value (same-seed init / same restored
        # checkpoint), so assemble the global array from per-device slices
        # locally — no communication.
        xv = np.asarray(x)
        return jax.make_array_from_callback(
            xv.shape, sh, lambda idx, xv=xv: xv[idx]
        )

    return jax.tree_util.tree_map(place, params)


def pad_batch_to_devices(batch: Dict[str, Any], n: int) -> Dict[str, Any]:
    """Pad the batch axis up to a multiple of the data-axis size by repeating
    the last element (padded rows contribute zero weight via masks of length
    0 — callers set lens to 0 on repeats)."""
    b = None
    for v in batch.values():
        if isinstance(v, np.ndarray):
            b = v.shape[0]
            break
    if b is None or b % n == 0:
        return batch
    pad = n - b % n
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            reps = np.repeat(v[-1:], pad, axis=0)
            # Zero every length key (ilens/olens/text_lens/prom_lens/
            # resp_lens/...) so the repeated rows are fully masked out of
            # every model's loss, not just FastSpeech2's.
            if k.endswith("lens"):
                reps = np.zeros_like(reps)
            out[k] = np.concatenate([v, reps], axis=0)
        elif isinstance(v, list):
            out[k] = v + [v[-1]] * pad
        else:
            out[k] = v
    return out
