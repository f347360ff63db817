"""End-to-end training-loop test on the 8-device CPU mesh: jitted sharded
train step, loss decreases, checkpoint save/resume round trip."""

import numpy as np
import pytest

from jatts_tpu.losses import LOSS_REGISTRY
from jatts_tpu.models.fastspeech2 import FastSpeech2
from jatts_tpu.parallel.mesh import get_mesh
from jatts_tpu.train.steps import fastspeech2_loss
from jatts_tpu.train.trainer import Trainer


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches
        self.sampler = self

    def set_epoch(self, e):
        pass

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _make_batch(rng, b=8, t_text=12, t_feats=48, odim=8):
    ds = rng.integers(1, 6, (b, t_text)).astype(np.int32)
    ilens = np.full((b,), t_text, np.int32)
    olens = ds.sum(-1).astype(np.int32)
    t_feats = max(t_feats, int(olens.max()))
    return {
        "xs": rng.integers(1, 20, (b, t_text)).astype(np.int32),
        "ilens": ilens,
        "ys": rng.normal(size=(b, t_feats, odim)).astype(np.float32),
        "olens": olens,
        "ds": ds,
        "ps": rng.normal(size=(b, t_text, 1)).astype(np.float32),
        "es": rng.normal(size=(b, t_text, 1)).astype(np.float32),
        "utt_ids": [f"utt{i}" for i in range(b)],
    }


@pytest.fixture(scope="module")
def config():
    return {
        "train_max_steps": 6,
        "log_interval_steps": 3,
        "save_interval_steps": 6,
        "eval_interval_steps": 0,
        "optimizer_type": "Adam",
        "optimizer_params": {"lr": 1e-3},
        "grad_norm": 1.0,
        "scheduler": "warmuplr",
        "scheduler_params": {"warmup_steps": 4},
    }


def test_train_loop_runs_and_learns(tmp_path, config):
    rng = np.random.default_rng(0)
    batches = [_make_batch(rng) for _ in range(3)]
    model = FastSpeech2(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32, dlayers=1,
        dunits=32, postnet_layers=2, postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2, energy_predictor_chans=8,
    )
    criterions = {
        "MelLoss": LOSS_REGISTRY["MelLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "PitchLoss": LOSS_REGISTRY["PitchLoss"](),
        "EnergyLoss": LOSS_REGISTRY["EnergyLoss"](),
    }
    mesh = get_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(
        config, model, criterions, fastspeech2_loss,
        FakeLoader(batches), dev_loader=None, outdir=str(tmp_path), mesh=mesh,
    )
    trainer.run()
    assert trainer.steps == 6
    # checkpoint written and restorable
    from jatts_tpu.utils.checkpoint import find_latest_checkpoint

    ckpt = find_latest_checkpoint(str(tmp_path))
    assert ckpt is not None and ckpt.endswith("checkpoint-6steps")

    trainer2 = Trainer(
        config, model, criterions, fastspeech2_loss,
        FakeLoader(batches), outdir=str(tmp_path), mesh=mesh,
    )
    trainer2.init_state(trainer2._prep(batches[0], 8))
    trainer2.load_checkpoint()
    assert trainer2.steps == 6


def test_steps_per_execution_scan_matches_single(tmp_path, config):
    """K-steps-per-dispatch lax.scan path is numerically identical to the
    single-step path (same rng folding, same batches, same optimizer)."""
    batches = [_make_batch(np.random.default_rng(i), t_feats=64) for i in range(4)]
    model = FastSpeech2(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32, dlayers=1,
        dunits=32, postnet_layers=2, postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2, energy_predictor_chans=8,
    )
    criterions = {
        "MelLoss": LOSS_REGISTRY["MelLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "PitchLoss": LOSS_REGISTRY["PitchLoss"](),
        "EnergyLoss": LOSS_REGISTRY["EnergyLoss"](),
    }
    mesh = get_mesh()

    def train(cfg_extra, outdir):
        # SGD, not Adam: Adam's m/sqrt(v) amplifies float-level grad noise
        # into O(lr)-sized update differences on no-signal params, which makes
        # exact param comparison ill-conditioned; with SGD any disagreement
        # beyond float noise is a real rng/batch-order/step-count bug
        # log_interval large so total_train_loss is never reset mid-run
        # (the two paths cross log boundaries at different steps otherwise)
        cfg = {**config, "train_max_steps": 4, "save_interval_steps": 1000,
               "log_interval_steps": 1000, "optimizer_type": "SGD", **cfg_extra}
        tr = Trainer(
            cfg, model, criterions, fastspeech2_loss,
            FakeLoader(batches), outdir=outdir, mesh=mesh, seed=0,
        )
        tr.run()
        return tr

    single = train({}, str(tmp_path / "single"))
    scanned = train({"steps_per_execution": 2}, str(tmp_path / "scan"))
    assert single.steps == scanned.steps == 4
    assert int(scanned.state.step) == 4

    # the 4-step loss trajectory (summed stats) must match: any rng-stream,
    # batch-order, or skipped-step bug would shift losses at steps >= 1
    for key, v in single.total_train_loss.items():
        assert abs(v - scanned.total_train_loss[key]) <= 1e-4 * abs(v) + 1e-6, key

    import jax

    a = jax.tree_util.tree_leaves(single.state.params)
    b = jax.tree_util.tree_leaves(scanned.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_steps_per_execution_flushes_odd_tail(tmp_path, config):
    """max_steps not divisible by K: shape-change + epoch-end flushes still
    execute every step exactly once."""
    # two shape buckets: forces a mid-epoch flush when the bucket changes
    batches = [_make_batch(np.random.default_rng(i), t_feats=64) for i in range(2)]
    batches += [_make_batch(np.random.default_rng(9), b=8, t_text=10, t_feats=56)]
    model = FastSpeech2(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32, dlayers=1,
        dunits=32, postnet_layers=2, postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2, energy_predictor_chans=8,
    )
    criterions = {"MelLoss": LOSS_REGISTRY["MelLoss"](),
                  "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
                  "PitchLoss": LOSS_REGISTRY["PitchLoss"](),
                  "EnergyLoss": LOSS_REGISTRY["EnergyLoss"]()}
    cfg = {**config, "train_max_steps": 5, "save_interval_steps": 1000,
           "steps_per_execution": 4}
    tr = Trainer(
        cfg, model, criterions, fastspeech2_loss,
        FakeLoader(batches), outdir=str(tmp_path), mesh=get_mesh(), seed=0,
    )
    tr.run()
    assert tr.steps >= 5
    assert int(tr.state.step) == tr.steps


def test_rng_impl_rbg(tmp_path, config):
    """`rng_impl: rbg` (TPU hardware RNG for dropout masks) threads through
    init/train and still learns; default stays threefry."""
    batches = [_make_batch(np.random.default_rng(i), t_feats=64) for i in range(2)]
    model = FastSpeech2(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32, dlayers=1,
        dunits=32, postnet_layers=2, postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2, energy_predictor_chans=8,
    )
    criterions = {k: LOSS_REGISTRY[k]() for k in
                  ("MelLoss", "DurationPredictorLoss", "PitchLoss", "EnergyLoss")}
    cfg = {**config, "train_max_steps": 2, "save_interval_steps": 1000,
           "rng_impl": "rbg"}
    tr = Trainer(cfg, model, criterions, fastspeech2_loss,
                 FakeLoader(batches), outdir=str(tmp_path), mesh=get_mesh())
    tr.run()
    assert tr.steps == 2
    assert np.isfinite(tr.total_train_loss["train/loss"])


def test_resume_across_ema_and_epochs_mismatches(tmp_path, config):
    """Full resume must tolerate optional-key mismatches between checkpoint
    and current config: no-EMA ckpt + EMA-on resume, EMA ckpt + EMA-off
    resume, and checkpoints written before the 'epochs' key existed (orbax
    template restore raises on ANY tree-structure difference)."""
    import jax

    from jatts_tpu.utils.checkpoint import find_latest_checkpoint, save_checkpoint

    rng = np.random.default_rng(1)
    batches = [_make_batch(rng) for _ in range(2)]
    model = FastSpeech2(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32, dlayers=1,
        dunits=32, postnet_layers=2, postnet_chans=8, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2, energy_predictor_chans=8,
    )
    criterions = {
        "MelLoss": LOSS_REGISTRY["MelLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "PitchLoss": LOSS_REGISTRY["PitchLoss"](),
        "EnergyLoss": LOSS_REGISTRY["EnergyLoss"](),
    }
    mesh = get_mesh()

    def make(outdir, extra):
        t = Trainer(
            {**config, **extra}, model, criterions, fastspeech2_loss,
            FakeLoader(batches), outdir=str(outdir), mesh=mesh,
        )
        t.init_state(t._prep(batches[0], 8))
        return t

    # --- save WITHOUT EMA, resume WITH EMA enabled ---
    d1 = tmp_path / "no_ema"
    t = make(d1, {})
    t.steps = 2
    t.state = t.state.replace(step=t.state.step + 2)
    t.save_checkpoint()
    t2 = make(d1, {"ema_decay": 0.999})
    t2.load_checkpoint()
    assert t2.steps == 2
    assert t2.state.ema_params is not None  # EMA stays enabled (fresh copy)

    # --- save WITH EMA, resume WITHOUT EMA ---
    d2 = tmp_path / "with_ema"
    t = make(d2, {"ema_decay": 0.999})
    t.steps = 3
    t.save_checkpoint()
    t3 = make(d2, {})
    t3.load_checkpoint()
    assert t3.steps == 3 and t3.state.ema_params is None

    # --- resume WITH EMA from an EMA checkpoint (adopts saved EMA) ---
    t4 = make(d2, {"ema_decay": 0.999})
    t4.load_checkpoint()
    assert t4.state.ema_params is not None

    # --- checkpoint written without the 'epochs' key (old format) ---
    d3 = tmp_path / "old_fmt"
    t = make(d3, {})
    save_checkpoint(str(d3), 4, {
        "params": jax.device_get(t.state.params),
        "batch_stats": jax.device_get(t.state.batch_stats),
        "opt_state": jax.device_get(t.state.opt_state),
        "steps": 4,
    })
    t5 = make(d3, {})
    t5.load_checkpoint()
    assert t5.steps == 4 and t5.epochs == 0
    assert find_latest_checkpoint(str(d3)).endswith("checkpoint-4steps")
