"""Sequence-parallel training through the normal Trainer path: config
`mesh: {model: M, sequence_parallel: true}` shards batch TIME axes over
'model' (Megatron-style SP on the tensor-parallel axis) in addition to the
TP param sharding — activations live (data, model)-sharded, which is how a
long-sequence E2-TTS frame budget scales past one chip's HBM. GSPMD inserts
the attention K/V all-gathers; the loss trajectory must agree with the
replicated dp-only run (same math, different layout)."""

import numpy as np
from jax.sharding import PartitionSpec as P

from jatts_tpu.models.e2tts import E2TTS
from jatts_tpu.parallel.mesh import get_mesh, shard_batch
from jatts_tpu.train.steps_e2tts import e2tts_kwargs, e2tts_loss
from jatts_tpu.train.trainer import Trainer

from test_train_loop import FakeLoader

CONFIG = {
    "train_max_steps": 3,
    "log_interval_steps": 1000,
    "save_interval_steps": 1000,
    "eval_interval_steps": 0,
    "optimizer_type": "SGD",
    "optimizer_params": {"lr": 1e-2},
    "grad_norm": 1.0,
    "scheduler": "warmuplr",
    "scheduler_params": {"warmup_steps": 4},
}

# dim sized so the attention/ff kernels clear shard_params_tp's min_size
MODEL = dict(idim=16, odim=8, dim=256, depth=2, heads=2, ff_mult=4)


def _batch(rng, b=8, tx=8, n=32, odim=8):
    # n divisible by the 'model' axis (2) -> the time axis gets SP-sharded
    return {
        "xs": rng.integers(0, 16, (b, tx)).astype(np.int32),
        "ilens": rng.integers(4, tx + 1, (b,)).astype(np.int32),
        "ys": rng.normal(size=(b, n, odim)).astype(np.float32),
        "olens": np.full((b,), n, np.int32),
    }


def _train(mesh, outdir, seq_parallel, max_steps=3):
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]
    cfg = {**CONFIG, "train_max_steps": max_steps}
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        cfg["mesh"] = {"model": mesh.shape["model"],
                       "sequence_parallel": seq_parallel}
    tr = Trainer(
        cfg, E2TTS(**MODEL), {}, e2tts_loss, FakeLoader(batches),
        outdir=outdir, mesh=mesh, seed=0,
        kwargs_fn=lambda b, m=None: e2tts_kwargs(b, m),
    )
    tr.run()
    return tr


def test_seq_shard_spec():
    mesh = get_mesh(n_model=2)
    batch = _batch(np.random.default_rng(0))
    sharded = shard_batch(batch, mesh, seq_parallel=True)
    # time axes of [B, T, ...] entries sharded over 'model'
    assert sharded["ys"].sharding.spec == P("data", "model")
    assert sharded["xs"].sharding.spec == P("data", "model")
    # per-sample lens stay data-sharded only
    assert sharded["olens"].sharding.spec == P("data")
    # without the flag nothing changes
    plain = shard_batch(batch, mesh)
    assert plain["ys"].sharding.spec == P("data")


def test_trainer_sp_matches_dp(tmp_path):
    mesh_sp = get_mesh(n_model=2)
    assert mesh_sp.shape["data"] == 4 and mesh_sp.shape["model"] == 2

    tr_sp = _train(mesh_sp, str(tmp_path / "sp"), seq_parallel=True)
    tr_dp = _train(get_mesh(), str(tmp_path / "dp"), seq_parallel=False)
    for k, v in tr_dp.total_train_loss.items():
        assert abs(v - tr_sp.total_train_loss[k]) <= 1e-3 * abs(v) + 1e-4, k


def test_trainer_sp_scan_path(tmp_path):
    """steps_per_execution + SP: the stacked [K, B, T, ...] batches get
    P(None, 'data', 'model') and the K-step scan program executes."""
    mesh = get_mesh(n_model=2)
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(4)]
    cfg = {**CONFIG, "train_max_steps": 4, "steps_per_execution": 2,
           "mesh": {"model": 2, "sequence_parallel": True}}
    tr = Trainer(
        cfg, E2TTS(**MODEL), {}, e2tts_loss, FakeLoader(batches),
        outdir=str(tmp_path), mesh=mesh, seed=0,
        kwargs_fn=lambda b, m=None: e2tts_kwargs(b, m),
    )
    tr.run()
    assert tr.steps == 4
    assert np.isfinite(tr.total_train_loss["train/loss"])
