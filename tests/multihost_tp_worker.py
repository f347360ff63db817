"""Worker for tests/test_multihost_tp_resume.py.

Runs the production Trainer on a dp x tp mesh (VALL-E AR, Megatron-sharded
kernels) either as one of N `jax.distributed` CPU processes (phases
'train'/'resume') or standalone on the same-size local mesh ('single').
Every process builds the IDENTICAL batch (same seed) — the multi-host batch
contract (parallel/mesh.py:_put_global).
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env alone insufficient (sitecustomize)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

MODEL = dict(idim=0, n_tokens=32, d_model=160, n_heads=2, n_layers=2,
             p_dropout=0.0, attn_backend="xla")
CONFIG = {
    "log_interval_steps": 1000,
    "save_interval_steps": 1000,
    "eval_interval_steps": 0,
    "optimizer_type": "SGD",
    "optimizer_params": {"lr": 1e-2},
    "grad_norm": 1.0,
    "scheduler": "warmuplr",
    "scheduler_params": {"warmup_steps": 4},
}


class Loader:
    def __init__(self, batches):
        self.batches = batches
        self.sampler = self

    def set_epoch(self, e):
        pass

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _batch(rng, b=8, tx=6, tp=8, tr=10):
    return {
        "text": rng.integers(0, 32, (b, tx)).astype(np.int32),
        "text_lens": rng.integers(3, tx + 1, (b,)).astype(np.int32),
        "proms": rng.integers(0, 32, (b, tp, 8)).astype(np.int32),
        "prom_lens": rng.integers(4, tp + 1, (b,)).astype(np.int32),
        "resps": rng.integers(0, 32, (b, tr)).astype(np.int32),
        "resp_lens": rng.integers(5, tr + 1, (b,)).astype(np.int32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--phase", choices=["train", "resume", "single"],
                    required=True)
    ap.add_argument("--steps", type=int, required=True)
    args = ap.parse_args()

    if args.phase != "single":
        jax.distributed.initialize(
            os.environ["JAX_COORDINATOR_ADDRESS"],
            int(os.environ["JAX_NUM_PROCESSES"]),
            int(os.environ["JAX_PROCESS_ID"]),
        )

    from jatts_tpu.models.valle import VALLEAR
    from jatts_tpu.parallel.mesh import get_mesh
    from jatts_tpu.train.steps_valle import valle_kwargs, valle_loss
    from jatts_tpu.train.trainer import Trainer

    # one batch repeated: step order is then save/resume-invariant
    batch = _batch(np.random.default_rng(0))
    mesh = get_mesh(n_model=2)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 2, mesh.shape
    trainer = Trainer(
        {**CONFIG, "train_max_steps": args.steps},
        VALLEAR(**MODEL), {}, valle_loss, Loader([batch]),
        outdir=args.outdir, mesh=mesh, seed=0,
        kwargs_fn=lambda b, m=None: valle_kwargs(b, m),
    )
    if args.phase == "resume":
        trainer.init_state(trainer._prep(batch, mesh.devices.size))
        trainer.load_checkpoint()
        assert trainer.steps > 0, "resume found no checkpoint steps"
        # restored params must come back TP-sharded over 'model'
        qkv = trainer.state.params["blocks_0"]["attn"]["to_qkv"]["kernel"]
        assert qkv.sharding.spec[-1] == "model", qkv.sharding
    trainer.run()
    assert trainer.steps == args.steps, trainer.steps
    trainer.save_checkpoint()
    print(f"WORKER_OK phase={args.phase} steps={trainer.steps}")


if __name__ == "__main__":
    main()
