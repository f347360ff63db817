"""Tensor-parallel training through the normal Trainer path (not the
standalone dryrun demo): config `mesh: {model: 2}` -> dp x tp mesh, large
kernels Megatron-sharded over 'model', train + checkpoint + resume, and the
loss trajectory agrees with the replicated dp-only run."""

import jax
import numpy as np

from jatts_tpu.models.valle import VALLEAR
from jatts_tpu.parallel.mesh import get_mesh
from jatts_tpu.train.steps_valle import valle_loss, valle_kwargs
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

# d_model chosen so the qkv/ffn kernels exceed shard_params_tp's min_size
# (160*480 and 160*640 elements) — small models stay replicated by design
MODEL = dict(idim=0, n_tokens=32, d_model=160, n_heads=2, n_layers=2,
             p_dropout=0.0, attn_backend="xla")


def _batch(rng, b=8, tx=6, tp=8, tr=10):
    return {
        "text": rng.integers(0, 32, (b, tx)).astype(np.int32),
        "text_lens": rng.integers(3, tx + 1, (b,)).astype(np.int32),
        "proms": rng.integers(0, 32, (b, tp, 8)).astype(np.int32),
        "prom_lens": rng.integers(4, tp + 1, (b,)).astype(np.int32),
        "resps": rng.integers(0, 32, (b, tr)).astype(np.int32),
        "resp_lens": rng.integers(5, tr + 1, (b,)).astype(np.int32),
    }


def _train(mesh, outdir, max_steps=3):
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]
    model = VALLEAR(**MODEL)
    cfg = {**CONFIG, "train_max_steps": max_steps}
    tr = Trainer(
        cfg, model, {}, valle_loss, FakeLoader(batches),
        outdir=outdir, mesh=mesh, seed=0,
        kwargs_fn=lambda b, m=None: valle_kwargs(b, m),
    )
    tr.run()
    return tr


def test_trainer_tp_shards_params_and_matches_dp(tmp_path):
    mesh_tp = get_mesh(n_model=2)
    assert mesh_tp.shape["data"] == 4 and mesh_tp.shape["model"] == 2

    tr_tp = _train(mesh_tp, str(tmp_path / "tp"))
    # at least the big kernels must actually live sharded over 'model'
    qkv = tr_tp.state.params["blocks_0"]["attn"]["to_qkv"]["kernel"]
    assert qkv.sharding.spec[-1] == "model"

    tr_dp = _train(get_mesh(), str(tmp_path / "dp"))
    for k, v in tr_dp.total_train_loss.items():
        assert abs(v - tr_tp.total_train_loss[k]) <= 1e-3 * abs(v) + 1e-4, k


def test_trainer_tp_checkpoint_resume(tmp_path):
    mesh = get_mesh(n_model=2)
    tr = _train(mesh, str(tmp_path), max_steps=2)
    tr.save_checkpoint()

    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]
    tr2 = Trainer(
        {**CONFIG, "train_max_steps": 4}, VALLEAR(**MODEL), {}, valle_loss,
        FakeLoader(batches), outdir=str(tmp_path), mesh=mesh, seed=0,
        kwargs_fn=lambda b, m=None: valle_kwargs(b, m),
    )
    tr2.init_state(tr2._prep(batches[0], mesh.devices.size))
    tr2.load_checkpoint()
    assert tr2.steps == 2
    # restored params come back TP-sharded
    qkv = tr2.state.params["blocks_0"]["attn"]["to_qkv"]["kernel"]
    assert qkv.sharding.spec[-1] == "model"
    tr2.run()
    assert tr2.steps == 4
    assert np.isfinite(tr2.total_train_loss["train/loss"])
