"""Generic trainer CLI (reference jatts/bin/tts_train.py:44-412).

Builds dataset/collater/model/criterions/optimizer/scheduler from the YAML
config, overlays CLI args, snapshots the config, and runs the trainer. The
reference's DDP/NCCL rendezvous collapses into one jax.sharding.Mesh; for
multi-host runs call with --multihost (jax.distributed.initialize + per-host
csv sharding via jax.process_index()).
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

# persistent XLA compile cache: CLI stages are separate processes; without
# this every stage repays full compilation
import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # default persistent cache; an env override wins (e.g. tests point it at
    # the committed suite cache -- stale AOT entries compiled on another
    # machine load-fail loudly and slowly, see CLAUDE.md)
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse
import logging
import os

from jatts_tpu.data.batcher import (
    COLLATER_REGISTRY,
    BatchSampler,
    DataLoader,
    DynamicBatchSampler,
)
from jatts_tpu.data.dataset import TTSDataset
from jatts_tpu.losses import LOSS_REGISTRY
from jatts_tpu.models import get_model
from jatts_tpu.train.steps import get_kwargs_fn, get_loss_fn
from jatts_tpu.train.trainer import Trainer
from jatts_tpu.utils.config import dump_config, load_config


def build_criterions(config):
    crits = {}
    for name, params in (config.get("criterions") or {}).items():
        params = dict(params or {})
        _type = params.pop("_type", None)
        if name == "MelLoss" and _type:
            crits[name] = LOSS_REGISTRY["MelLoss"](_type=_type, params=params)
        else:
            crits[name] = LOSS_REGISTRY[name](**params)
    return crits


def main():
    parser = argparse.ArgumentParser(description="Train a TTS model (stage 3).")
    parser.add_argument("--train-csv", required=True)
    parser.add_argument("--dev-csv", required=True)
    parser.add_argument("--stats", required=True)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--resume", default=None, nargs="?", const="")
    parser.add_argument("--pretrain", default=None, help="params-only init checkpoint")
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    if args.multihost:
        import jax

        # Cloud TPU pods auto-detect; otherwise rendezvous via env (the
        # reference's MASTER_ADDR/RANK/WORLD_SIZE analog,
        # run_e2tts_multinode.sh:169-215): JAX_COORDINATOR_ADDRESS +
        # JAX_NUM_PROCESSES + JAX_PROCESS_ID.
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()

    config = load_config(args.config)
    config.update(
        {k: v for k, v in vars(args).items() if k not in ("config",)}
    )

    # vocab -> idim (reference tts_train.py:186-190)
    with open(args.token_list, encoding="utf-8") as f:
        n_vocab = len([l for l in f if l.strip()])
    config.setdefault("model_params", {})
    model_params = dict(config["model_params"])
    model_params["idim"] = n_vocab
    if isinstance(model_params.get("dtype"), str):
        # yaml `dtype: bfloat16` -> jnp dtype (compute dtype; params stay f32)
        import jax.numpy as jnp

        model_params["dtype"] = jnp.dtype(model_params["dtype"])

    os.makedirs(args.outdir, exist_ok=True)
    dump_config(config, os.path.join(args.outdir, "config.yml"))

    feat_list = config.get("feat_list", ["mel"])
    ds_kwargs = dict(
        stats_path=args.stats,
        feat_list=feat_list,
        token_list_path=args.token_list,
        hop_size=config.get("hop_size", 300),
        sampling_rate=config.get("sampling_rate", 24000),
        allow_cache=config.get("allow_cache", False),
        prompt_strategy=config.get("prompt_strategy"),
    )
    train_set = TTSDataset(args.train_csv, **ds_kwargs)
    dev_set = TTSDataset(args.dev_csv, **ds_kwargs)

    # Multi-host data strategy (replaces the reference's DistributedSampler,
    # SURVEY.md §5.8): every host builds the IDENTICAL batch schedule (same
    # csv + same seed), and shard_batch (parallel/mesh.py:_put_global) has
    # each host contribute its strided row slice of every batch via
    # make_array_from_process_local_data. Identical schedules guarantee all
    # hosts dispatch the same program with the same global shapes — per-host
    # disjoint batch lists (the round-2 design) pad to different bucket
    # shapes per host and deadlock SPMD collectives.
    lengths = [train_set.get_frame_len(i) for i in range(len(train_set))]
    if config.get("batch_size_per_gpu"):  # frame-budget batching (E2-TTS)
        sampler = DynamicBatchSampler(
            lengths, int(config["batch_size_per_gpu"]),
            max_samples=int(config.get("max_samples", 0)),
            seed=config.get("sampler_random_seed", args.seed),
        )
    else:
        sampler = BatchSampler(lengths, int(config.get("batch_size", 16)), seed=args.seed)

    collater_kwargs = {"out_feat_type": config.get("out_feat_type", "mel")}
    # YAML `collater_params:` reaches the collater's real knobs (pad
    # multiples, prompt crop, seed) — previously only out_feat_type was
    # constructible from config
    collater_kwargs.update(config.get("collater_params") or {})
    if (
        config.get("collater_type") == "VALLECollater"
        and "prompt_max_frame_length" not in collater_kwargs
        and "prompt_max_frame_length" in model_params
    ):
        # keep the collater's prompt crop consistent with the model config
        # (the reference crops inside the model, so one yaml key rules both)
        collater_kwargs["prompt_max_frame_length"] = int(
            model_params["prompt_max_frame_length"]
        )
    collater = COLLATER_REGISTRY[config.get("collater_type", "FastSpeech2Collater")](
        **collater_kwargs
    )
    # background prefetch overlaps h5 reads/collation with device steps
    # (the reference's DataLoader num_workers analog). With
    # steps_per_execution=K the trainer buffers K batches per dispatch, so
    # the prefetch depth must cover a full scan window or the host rebuilds
    # most of the next window while the device sits idle.
    k_exec = int(config.get("steps_per_execution", 1))
    train_loader = DataLoader(
        train_set, sampler, collater,
        prefetch=int(config.get("num_prefetch_batches", max(2, k_exec))),
    )
    dev_lengths = [dev_set.get_frame_len(i) for i in range(len(dev_set))]
    dev_loader = DataLoader(
        dev_set,
        BatchSampler(dev_lengths, int(config.get("batch_size", 16)), shuffle=False),
        collater,
    )

    model_cls = get_model(config["model_type"])
    model = model_cls(**model_params)
    criterions = build_criterions(config)
    loss_fn = get_loss_fn(config["trainer_type"])

    from jatts_tpu.parallel.mesh import get_mesh

    # config `mesh: {model: M}` -> dp x tp mesh; Trainer Megatron-shards the
    # large kernels over 'model' (parallel/mesh.py:shard_params_tp). The
    # reference has no tensor parallelism at all (SURVEY.md §2.9).
    mesh_cfg = config.get("mesh") or {}
    mesh = get_mesh(n_model=int(mesh_cfg.get("model", 1)))
    logging.info(
        f"mesh: data={mesh.shape['data']} model={mesh.shape['model']}"
    )

    eval_hook = None
    if config["model_type"] in ("FastSpeech2", "MatchaTTS", "MatchaTTS_MAS", "VITS"):
        from jatts_tpu.train.intermediate import make_mel_eval_hook

        n_save = int(config.get("num_save_intermediate_results", 4))
        eval_hook = make_mel_eval_hook(
            [dev_set[i] for i in range(min(n_save, len(dev_set)))],
            num_save=n_save,
            max_frames=int(config.get("eval_max_frames", 1024)),
        )

    trainer = Trainer(
        config, model, criterions, loss_fn, train_loader, dev_loader,
        outdir=args.outdir, mesh=mesh, seed=args.seed, eval_hook=eval_hook,
        kwargs_fn=get_kwargs_fn(config["trainer_type"]),
    )

    first_batch = collater([train_set[i] for i in sampler.batches[0]])
    trainer.init_state(trainer._prep(first_batch, mesh.devices.size))
    if args.pretrain:
        trainer.load_checkpoint(args.pretrain, load_only_params=True)
    if args.resume is not None:
        trainer.load_checkpoint(args.resume or None)

    # Preemption safety: TPU pods/k8s deliver SIGTERM on eviction, which by
    # default kills the process WITHOUT unwinding the `finally` below (the
    # reference's try/finally, bin/tts_train.py:401-408, has the same hole).
    # First signal: request a deferred stop — the trainer raises SystemExit
    # at the next step boundary, where train-state buffers are consistent
    # (raising directly from the handler can land between a donating
    # dispatch and the state rebind, leaving deleted arrays for the final
    # save). Second signal: force immediate exit. 143 = 128+SIGTERM.
    import signal

    sig_count = [0]

    def _on_term(signum, frame):
        sig_count[0] += 1
        trainer.request_stop = True
        if sig_count[0] > 1:
            raise SystemExit(128 + signum)

    prev_term = signal.signal(signal.SIGTERM, _on_term)
    try:
        trainer.run()
    finally:
        signal.signal(signal.SIGTERM, prev_term)  # don't leak into callers
        try:
            trainer.save_checkpoint()
            logging.info(f"saved final checkpoint at {trainer.steps} steps")
        except Exception as e:  # noqa: BLE001
            # a non-SIGTERM abort (Ctrl-C, device OOM) can land between a
            # donating dispatch and the state rebind, leaving deleted
            # buffers — a raise here would MASK the original exception
            logging.error(f"final checkpoint save failed: {e}")


if __name__ == "__main__":
    main()
