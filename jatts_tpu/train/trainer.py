"""Generic trainer (reference jatts/trainers/base.py:17-227, re-designed).

One jitted, mesh-sharded train step per model family. The torch reference
mutates module state and steps an optimizer object; here the whole step —
forward, losses, grad, clip, optimizer update, batch-stats update — is a pure
function ``state, batch, rng -> state, stats`` compiled once per batch bucket
and executed with donated state (no host round trips except interval hooks).

Data parallelism comes from sharding the batch over the mesh's "data" axis;
XLA inserts the gradient all-reduce (replaces DDP/NCCL,
reference tts_train.py:355-363).
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from jatts_tpu.parallel.mesh import pad_batch_to_devices, shard_batch
from jatts_tpu.train.schedulers import build_optimizer, build_schedule
from jatts_tpu.utils.checkpoint import (
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None  # E2-TTS-style EMA weights (reference
    #                         trainers/e2tts.py:121-124, ema_pytorch)


LossFn = Callable[..., Any]
# signature: (model, params, batch_stats, batch, rng, criterions, config, step,
#             deterministic) -> (loss, (stats_dict, new_batch_stats))


class Trainer:
    """Steps-based training loop with rank-0 interval hooks
    (log/eval/save, reference base.py:196-224)."""

    def __init__(
        self,
        config: Dict[str, Any],
        model,
        criterions: Dict[str, Any],
        loss_fn: LossFn,
        train_loader,
        dev_loader=None,
        outdir: str = "exp/tmp",
        mesh=None,
        seed: int = 0,
        eval_hook: Optional[Callable] = None,
        kwargs_fn: Optional[Callable] = None,  # batch -> model.__call__ kwargs
    ):
        self.config = config
        self.model = model
        self.criterions = criterions
        self.loss_fn = loss_fn
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.outdir = outdir
        self.mesh = mesh
        self.eval_hook = eval_hook
        self.kwargs_fn = kwargs_fn
        self.steps = 0
        self.epochs = 0
        # PRNG impl: threefry dropout-mask generation is ALU-bound on TPU and
        # measured at ~45% of the FS2 train step (benchmarks/bench_train_step
        # probe, v5e); 'rbg' uses the hardware RNG instruction. Default stays
        # threefry (reproducibility / cross-backend determinism); recipes opt
        # into rbg via `rng_impl: rbg`.
        self.rng = jax.random.key(seed, impl=config.get("rng_impl") or "threefry2x32")
        self.tx = build_optimizer(config)
        accum = int(config.get("gradient_accumulate_steps", 1) or 1)
        if accum > 1:
            # reference grad accumulation (trainers/base.py:64,130-146)
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        self.ema_decay = float(config.get("ema_decay", 0.0) or 0.0)
        # Megatron-style sequence parallelism: config `mesh: {model: M,
        # sequence_parallel: true}` shards batch TIME axes over 'model' in
        # addition to TP params (parallel/mesh.py shard_batch) — activation
        # memory scales past one chip for long-sequence models (E2-TTS).
        self.seq_parallel = bool(
            (config.get("mesh") or {}).get("sequence_parallel", False)
        )
        self.schedule = build_schedule(config)
        self.total_train_loss: Dict[str, float] = defaultdict(float)
        self.finish_train = False
        self.request_stop = False  # set by the SIGTERM handler (preemption)
        self._writer = None
        os.makedirs(outdir, exist_ok=True)

        self.train_step = self._build_train_step()
        # steps_per_execution > 1: run K optimizer steps per device dispatch
        # via an on-device lax.scan (TPU-first: amortizes host-dispatch
        # latency, which dominates on remote/tunneled backends; the torch
        # reference necessarily dispatches per step). rng folding inside the
        # scan matches the single-step path exactly (fold_in(rng, step_idx)).
        self.steps_per_execution = int(config.get("steps_per_execution", 1) or 1)
        self.train_step_scan = (
            self._build_train_step_scan() if self.steps_per_execution > 1 else None
        )
        self._pending_batches: list = []
        self.eval_step = self._build_eval_step()
        self.state: Optional[TrainState] = None
        self._mh_synced = False  # multi-host first-step rendezvous done

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch: Dict[str, Any]) -> TrainState:
        init_rng, self.rng = jax.random.split(self.rng)
        variables = self._init_variables(init_rng, sample_batch)
        params = variables["params"]
        init_type = getattr(self.model, "init_type", None)
        if init_type and init_type != "none":
            # reference-style re-initialization (jatts/modules/initialize.py)
            from jatts_tpu.utils.initialize import initialize

            reinit_rng, self.rng = jax.random.split(self.rng)
            params = initialize(params, init_type, reinit_rng)
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        logging.info(f"model parameters: {n_params:,}")
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if self.ema_decay > 0
            else None,
        )
        if self.mesh is not None:
            self.state = self._shard_state(self.state)
        return self.state

    def _shard_state(self, state: TrainState) -> TrainState:
        """Place the train state on the mesh: replicated on a pure-dp mesh;
        on a dp x tp mesh (config ``mesh: {model: M}`` -> get_mesh(n_model=M))
        large kernels are Megatron-sharded over 'model' via the same
        size-based rule for params, optimizer moments, and EMA (their leaves
        share shapes, so the shardings stay consistent and XLA/GSPMD inserts
        the collectives inside the jitted step)."""
        from jatts_tpu.parallel.mesh import replicate_tree, shard_params_tp

        if self.mesh.shape.get("model", 1) > 1:
            return shard_params_tp(state, self.mesh)
        return replicate_tree(state, self.mesh)

    def _host_fetch(self, tree):
        """``jax.device_get`` that also works for TP-sharded state on a
        MULTI-HOST mesh: leaves spanning non-addressable devices (and not
        fully replicated) cannot be fetched directly, so they are first
        all-gathered to fully-replicated with one jitted identity (GSPMD
        inserts the cross-host all-gathers). Single-host / replicated trees
        take the plain device_get path (exercised by
        tests/test_multihost_tp_resume.py)."""

        def _unfetchable(x):
            return (
                hasattr(x, "is_fully_addressable")
                and not x.is_fully_addressable
                and not x.is_fully_replicated
            )

        if self.mesh is None or not any(
            _unfetchable(x) for x in jax.tree_util.tree_leaves(tree)
        ):
            return jax.device_get(tree)
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        return jax.device_get(jax.jit(lambda t: t, out_shardings=rep)(tree))

    def _init_variables(self, rng, batch):
        if self.kwargs_fn is not None:
            kwargs = self.kwargs_fn(batch, self.model)
        else:
            kwargs = self._model_kwargs(batch)

        # jit the whole init: eager init dispatches thousands of tiny ops,
        # which is pathological on remote-dispatch backends
        @jax.jit
        def init_fn(rng):
            return self.model.init(
                {"params": rng, "dropout": rng, "noise": rng},
                **kwargs, deterministic=False,
            )

        return init_fn(rng)

    @staticmethod
    def _model_kwargs(batch: Dict[str, Any]) -> Dict[str, Any]:
        """Filter the numpy batch down to model-forward kwargs."""
        drop = {"utt_ids"}
        return {k: v for k, v in batch.items() if k not in drop}

    # -- steps ------------------------------------------------------------
    def _build_train_step(self):
        model, criterions, config, loss_fn, tx = (
            self.model, self.criterions, self.config, self.loss_fn, self.tx,
        )

        def step_fn(state: TrainState, batch: Dict[str, Any], rng):
            def compute(params):
                return loss_fn(
                    model, params, state.batch_stats, batch, rng, criterions,
                    config, state.step, False,
                )

            (loss, (stats, new_batch_stats)), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                d = self.ema_decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p * (1.0 - d), new_ema, new_params
                )
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt_state,
                ema_params=new_ema,
            )
            stats = dict(stats)
            stats["train/loss"] = loss
            stats["train/grad_norm"] = optax.global_norm(grads)
            return new_state, stats

        self._raw_step_fn = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_train_step_scan(self):
        """K steps in ONE compiled program: ``lax.scan`` over stacked batches
        (leading axis K). Returns per-K-mean stats. Exact rng parity with the
        single-step loop via per-step ``fold_in(rng, global_step_idx)``."""
        step_fn = self._raw_step_fn

        def scan_fn(state: TrainState, batches, rng, offsets):
            def body(carry, xs):
                batch, off = xs
                new_state, stats = step_fn(carry, batch, jax.random.fold_in(rng, off))
                return new_state, stats

            state, stats = jax.lax.scan(body, state, (batches, offsets))
            return state, jax.tree_util.tree_map(lambda x: x.mean(0), stats)

        return jax.jit(scan_fn, donate_argnums=(0,))

    def _build_eval_step(self):
        model, criterions, config, loss_fn = (
            self.model, self.criterions, self.config, self.loss_fn,
        )

        def step_fn(state: TrainState, batch: Dict[str, Any], rng):
            loss, (stats, _) = loss_fn(
                model, state.params, state.batch_stats, batch, rng, criterions,
                config, state.step, True,
            )
            stats = dict(stats)
            stats["loss"] = loss
            return stats

        return jax.jit(step_fn)

    # -- loop -------------------------------------------------------------
    def run(self) -> None:
        max_steps = int(self.config["train_max_steps"])
        log_every = int(self.config.get("log_interval_steps", 100))
        save_every = int(self.config.get("save_interval_steps", 10000))
        eval_every = int(self.config.get("eval_interval_steps", 10000))
        t0 = time.time()
        n_dev = self.mesh.devices.size if self.mesh is not None else 1

        while not self.finish_train:
            if hasattr(self.train_loader.sampler, "set_epoch"):
                self.train_loader.sampler.set_epoch(self.epochs)
            for batch in self.train_loader:
                if self.state is None:
                    self.init_state(self._prep(batch, n_dev))
                prepped = self._prep(batch, n_dev)
                for dk, stats in self._dispatch(prepped):
                    self._after_steps(dk, stats, log_every, save_every,
                                      eval_every, t0)
                    if self.steps % log_every < dk:
                        t0 = time.time()
                if self.steps >= max_steps:
                    self.finish_train = True
                    break
            if not self.finish_train:
                for dk, stats in self._flush_pending():
                    self._after_steps(dk, stats, log_every, save_every,
                                      eval_every, t0)
                    if self.steps >= max_steps:  # flush may cross the budget
                        self.finish_train = True
                        break
            self.epochs += 1
        # training is over: DISCARD (don't run) any partially filled K-step
        # buffer — flushing here would train up to K-1 steps past
        # train_max_steps and misname the final checkpoint
        self._pending_batches = []
        logging.info(f"finished training at {self.steps} steps")

    def _dispatch(self, prepped):
        """Execute ``prepped`` (possibly buffering for a K-step scan).
        Yields (n_steps_executed, mean_stats) per device dispatch."""
        k = self.steps_per_execution
        if k <= 1:
            yield self._run_single(prepped)
            return
        sig = tuple(
            (name, tuple(np.shape(v)), np.asarray(v).dtype.str)
            for name, v in sorted(prepped.items())
        )
        if self._pending_batches and self._pending_batches[0][0] != sig:
            # shape bucket changed: flush the old bucket first (scan needs
            # identical shapes across the K stacked batches)
            yield from self._flush_pending()
        self._pending_batches.append((sig, prepped))
        if len(self._pending_batches) == k:
            yield self._run_scan()

    def _sync_processes_after_compile(self, compile_fn):
        """Multi-host: compile BEFORE the first execution, then rendezvous.

        The first executed program creates the Gloo collective contexts,
        whose KV-store join times out after a fixed 30 s — shorter than
        cross-host compile skew. AOT-compiling first (the persistent XLA
        cache makes the jit path's own compile a fast deserialization) and
        meeting at a coordination-service barrier bounds the skew to
        seconds. No-op single-process."""
        if self._mh_synced or jax.process_count() == 1:
            return
        compile_fn()
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier("jatts_tpu_first_step", timeout_in_ms=1_200_000)
        self._mh_synced = True

    def _run_single(self, prepped):
        if self.mesh is not None:
            prepped = shard_batch(prepped, self.mesh, self.seq_parallel)
        step_rng = jax.random.fold_in(self.rng, self.steps)
        self._sync_processes_after_compile(
            lambda: self.train_step.lower(self.state, prepped, step_rng).compile()
        )
        self.state, stats = self.train_step(self.state, prepped, step_rng)
        self.steps += 1
        return 1, stats

    def _flush_pending(self):
        """Run buffered batches that never filled a K bucket, one step each."""
        pending = [b for _, b in self._pending_batches]
        self._pending_batches = []
        for prepped in pending:
            yield self._run_single(prepped)

    def _run_scan(self):
        k = len(self._pending_batches)
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *[b for _, b in self._pending_batches]
        )
        self._pending_batches = []
        if self.mesh is not None:
            from jatts_tpu.parallel.mesh import shard_stacked_batch

            stacked = shard_stacked_batch(stacked, self.mesh, self.seq_parallel)
        offsets = np.arange(self.steps, self.steps + k, dtype=np.int32)
        self._sync_processes_after_compile(
            lambda: self.train_step_scan.lower(
                self.state, stacked, self.rng, offsets
            ).compile()
        )
        self.state, stats = self.train_step_scan(
            self.state, stacked, self.rng, offsets
        )
        self.steps += k
        return k, stats

    def _after_steps(self, dk, stats, log_every, save_every, eval_every, t0):
        for k, v in stats.items():
            self.total_train_loss[k] += float(v) * dk
        self._check_profile()
        # boundary-crossing checks: with dk>1 the step counter can jump past
        # an exact multiple; fire the hook whenever an interval was crossed
        if (self.steps % log_every) < dk:
            self._log_interval(log_every, t0)
        if eval_every and (self.steps % eval_every) < dk:
            self._eval_interval()
        if (self.steps % save_every) < dk:
            self.save_checkpoint()
        if getattr(self, "request_stop", False):
            # deferred preemption stop (SIGTERM handler in bin/tts_train):
            # raised here, after the state rebind, so the final-save
            # `finally` sees a consistent (non-donated) train state
            raise SystemExit(143)

    def _prep(self, batch: Dict[str, Any], n_dev: int) -> Dict[str, Any]:
        batch = pad_batch_to_devices(batch, n_dev)
        return self._model_kwargs(batch)

    # -- hooks ------------------------------------------------------------
    def _check_profile(self) -> None:
        """jax.profiler trace over a step window (replaces the reference's
        ad-hoc wall-clock logs, SURVEY.md §5.1). Configure with
        ``profile_start_step`` / ``profile_num_steps`` in the yaml."""
        start = int(self.config.get("profile_start_step", 0) or 0)
        if not start:
            return
        n = int(self.config.get("profile_num_steps", 5))
        # boundary-crossing (not ==): under steps_per_execution=K the step
        # counter advances K at a time and can jump PAST start / start+n —
        # an equality check would then never start (or never stop) the trace
        started = getattr(self, "_profile_started", False)
        stopped = getattr(self, "_profile_stopped", False)
        if not started and self.steps >= start:
            import jax.profiler

            self._profile_started = True
            self._profile_dir = os.path.join(self.outdir, "profile")
            jax.profiler.start_trace(self._profile_dir)
            logging.info(f"profiler trace started -> {self._profile_dir}")
        elif started and not stopped and self.steps >= start + n:
            import jax.profiler

            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                self.state.params,
            )
            jax.profiler.stop_trace()
            self._profile_stopped = True
            logging.info("profiler trace stopped")

    def _device_memory_stats(self) -> Dict[str, float]:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            return {
                "mem/bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
                "mem/peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:  # noqa: BLE001 — not all backends expose stats
            return {}

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(self.outdir)
        return self._writer

    def _log_interval(self, interval: int, t0: float) -> None:
        dt = time.time() - t0
        rank0 = jax.process_index() == 0  # rank-0 tensorboard (ref base.py)
        msgs = []
        for k, v in sorted(self.total_train_loss.items()):
            avg = v / interval
            if rank0:
                self.writer.add_scalar(k, avg, self.steps)
            msgs.append(f"{k}={avg:.4f}")
        # with optax.MultiSteps the inner optimizer's count (which indexes
        # the schedule) advances once per `accum` micro-steps — log the LR
        # actually applied, not schedule(micro_steps)
        accum = int(self.config.get("gradient_accumulate_steps", 1) or 1)
        lr = float(self.schedule(self.steps // accum))
        if rank0:
            self.writer.add_scalar("train/lr", lr, self.steps)
            for k, v in self._device_memory_stats().items():
                self.writer.add_scalar(k, v, self.steps)  # peak-memory logging
                #   (reference logs peak CUDA memory, trainers/base.py:215-217)
        logging.info(
            f"(steps {self.steps}) {' '.join(msgs)} lr={lr:.2e} "
            f"({interval / max(dt, 1e-9):.2f} steps/s)"
        )
        self.total_train_loss = defaultdict(float)

    def _eval_interval(self) -> None:
        if self.dev_loader is None:
            return
        totals: Dict[str, float] = defaultdict(float)
        count = 0
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        eval_synced = False
        for batch in self.dev_loader:
            prepped = self._prep(batch, n_dev)
            if self.mesh is not None:
                prepped = shard_batch(prepped, self.mesh, self.seq_parallel)
            if not eval_synced and jax.process_count() > 1:
                # same compile-skew hazard as the first train step: the
                # eval program's first collective must not Gloo-timeout
                # while a peer is still compiling
                self.eval_step.lower(self.state, prepped, jax.random.key(0)).compile()
                from jax._src import distributed

                client = distributed.global_state.client
                if client is not None:
                    client.wait_at_barrier(
                        f"jatts_tpu_eval_{self.steps}", timeout_in_ms=1_200_000
                    )
                eval_synced = True
            stats = self.eval_step(self.state, prepped, jax.random.key(0))
            for k, v in stats.items():
                totals[k] += float(v)
            count += 1
        rank0 = jax.process_index() == 0  # rank-0 tensorboard (ref base.py)
        for k, v in totals.items():
            if rank0:
                # loss fns emit 'train/<name>' keys — strip so eval tags are
                # 'eval/<name>', not 'eval/train/<name>'
                tag = k.split("/", 1)[1] if k.startswith("train/") else k
                self.writer.add_scalar(f"eval/{tag}", v / max(count, 1), self.steps)
        logging.info(
            f"(steps {self.steps}) eval "
            + " ".join(f"{k}={v / max(count, 1):.4f}" for k, v in sorted(totals.items()))
        )
        if self.eval_hook is not None:
            self.eval_hook(self)

    # -- checkpoint -------------------------------------------------------
    def save_checkpoint(self) -> str:
        # Under multi-host ALL processes must call into orbax (its save
        # contains cross-process sync barriers; rank-gating deadlocks the
        # shutdown barrier). orbax itself writes host-local numpy data on
        # the primary host only — reference-style rank-0 writing falls out.
        assert self.state is not None
        host = self._host_fetch(
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                **(
                    {"ema_params": self.state.ema_params}
                    if self.state.ema_params is not None
                    else {}
                ),
            }
        )
        path = save_checkpoint(
            self.outdir,
            self.steps,
            {**host, "steps": self.steps, "epochs": self.epochs},
        )
        logging.info(f"saved checkpoint: {path}")
        return path

    def load_checkpoint(self, path: Optional[str] = None, load_only_params: bool = False) -> None:
        """Resume (reference base.py:107-124)."""
        if path is None:
            path = find_latest_checkpoint(self.outdir)
            if path is None:
                raise FileNotFoundError(f"no checkpoint under {self.outdir}")
        assert self.state is not None, "call init_state before load_checkpoint"
        if load_only_params:
            # raw restore: params/batch_stats work as plain dicts, and
            # imported/pretrain checkpoints may carry different tree shapes
            restored = restore_checkpoint(path)
        else:
            # full resume MUST restore with a template: a templateless orbax
            # restore returns plain dicts, silently destroying the optax
            # NamedTuple structure of opt_state (the next tx.update crashes).
            # Optional keys (ema_params, epochs) are included only when the
            # checkpoint actually has them — orbax template restore raises on
            # ANY tree-structure mismatch, so resuming a no-EMA checkpoint
            # with EMA enabled (or vice versa, or a pre-`epochs` checkpoint)
            # must not put them in the template.
            from jatts_tpu.utils.checkpoint import checkpoint_top_level_keys

            disk_keys = checkpoint_top_level_keys(path)
            template = {
                "params": self._host_fetch(self.state.params),
                "batch_stats": self._host_fetch(self.state.batch_stats),
                "opt_state": self._host_fetch(self.state.opt_state),
                "steps": 0,
            }
            if disk_keys is None or "epochs" in disk_keys:
                template["epochs"] = 0
            if disk_keys is not None and "ema_params" in disk_keys:
                # params-shaped template works even when EMA is off in the
                # current config (the weights are simply loaded into ema)
                template["ema_params"] = self._host_fetch(
                    self.state.ema_params
                    if self.state.ema_params is not None
                    else self.state.params
                )
            elif disk_keys is None and self.state.ema_params is not None:
                template["ema_params"] = self._host_fetch(self.state.ema_params)
            restored = restore_checkpoint(path, template)
        # adopt checkpoint EMA only if EMA is enabled in the current config
        # (state.ema_params set): a restored-but-unused EMA copy would only
        # waste memory and imply a tracking that is not happening
        ema = (
            restored.get("ema_params", self.state.ema_params)
            if self.state.ema_params is not None
            else None
        )
        if load_only_params:
            self.state = self.state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"],
                ema_params=ema,
            )
        else:
            self.state = self.state.replace(
                step=jnp.asarray(restored["steps"], jnp.int32),
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                ema_params=ema,
            )
            self.steps = int(restored["steps"])
            self.epochs = int(restored.get("epochs", 0))
        if self.mesh is not None:
            self.state = self._shard_state(self.state)
        logging.info(f"loaded checkpoint from {path} (steps={self.steps})")
