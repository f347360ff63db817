"""Two training steps through the jitted mesh-sharded Trainer for every model
family — exercises loss assembly, schedules, rngs, batch_stats and EMA."""

import numpy as np
import pytest

from jatts_tpu.losses import LOSS_REGISTRY
from jatts_tpu.parallel.mesh import get_mesh
from jatts_tpu.train.steps import get_loss_fn
from jatts_tpu.train.trainer import Trainer


from test_train_loop import FakeLoader  # single fixture, no divergence


BASE_CONFIG = {
    "train_max_steps": 2,
    "log_interval_steps": 1,
    "save_interval_steps": 1000,
    "eval_interval_steps": 0,
    "optimizer_type": "Adam",
    "optimizer_params": {"lr": 1e-4},
    "grad_norm": 1.0,
    "scheduler": "warmuplr",
    "scheduler_params": {"warmup_steps": 4},
}


def _run(model, loss_fn, criterions, batch, config=None, tmp="/tmp/jatts_t", kwargs_fn=None):
    cfg = {**BASE_CONFIG, **(config or {})}
    trainer = Trainer(
        cfg, model, criterions, loss_fn, FakeLoader([batch]),
        outdir=tmp, mesh=get_mesh(), kwargs_fn=kwargs_fn,
    )
    trainer.run()
    assert trainer.steps == 2
    assert np.isfinite(trainer.total_train_loss.get("train/loss", 0.0))
    return trainer


def test_matcha_mas_trainer(tmp_path):
    from jatts_tpu.models.matchatts_mas import MatchaTTS_MAS

    rng = np.random.default_rng(0)
    b, tx, tf = 8, 8, 32
    batch = {
        "xs": rng.integers(1, 20, (b, tx)).astype(np.int32),
        "ilens": np.full((b,), tx, np.int32),
        "ys": rng.normal(size=(b, tf, 8)).astype(np.float32),
        "olens": np.full((b,), tf, np.int32),
    }
    model = MatchaTTS_MAS(
        idim=20, odim=8, adim=16, aheads=2, elayers=1, eunits=32,
        duration_predictor_chans=8, decoder_channels=(16, 16),
        decoder_attention_head_dim=8, conformer_enc_kernel_size=7,
    )
    crits = {
        "EncoderPriorLoss": LOSS_REGISTRY["EncoderPriorLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "ForwardSumLoss": LOSS_REGISTRY["ForwardSumLoss"](),
    }
    _run(model, get_loss_fn("MatchaTTSTrainer"), crits, batch,
         {"dp_train_start_steps": 1, "bin_loss_start_steps": 0, "lambda_align": 2.0},
         str(tmp_path))


def test_vits_trainer(tmp_path):
    from jatts_tpu.models.vits import VITS

    rng = np.random.default_rng(1)
    b, tx, tf = 8, 8, 32
    batch = {
        "xs": rng.integers(1, 20, (b, tx)).astype(np.int32),
        "ilens": np.full((b,), tx, np.int32),
        "ys": rng.normal(size=(b, tf, 8)).astype(np.float32),
        "olens": np.full((b,), tf, np.int32),
    }
    model = VITS(
        idim=20, odim=8, adim=16, aheads=2, text_encoder_blocks=1,
        text_encoder_ffn_expand=2, dlayers=1, dunits=32,
        duration_predictor_chans=8, posterior_encoder_layers=2,
        flow_flows=2, flow_layers=2, conformer_dec_kernel_size=7,
    )
    crits = {
        "MelLoss": LOSS_REGISTRY["MelLoss"](),
        "KLDivergenceLoss": LOSS_REGISTRY["KLDivergenceLoss"](),
        "DurationPredictorLoss": LOSS_REGISTRY["DurationPredictorLoss"](),
        "ForwardSumLoss": LOSS_REGISTRY["ForwardSumLoss"](),
    }
    _run(model, get_loss_fn("VITSTrainer"), crits, batch,
         {"lambda_mel": 10.0, "lambda_align": 2.0, "dp_train_start_steps": 1},
         str(tmp_path))


def test_e2tts_trainer_with_ema_and_accum(tmp_path):
    from jatts_tpu.models.e2tts import E2TTS

    rng = np.random.default_rng(2)
    b, tf = 8, 24
    text = rng.integers(0, 20, (b, 10)).astype(np.int32)
    batch = {
        "xs": text,
        "ys": rng.normal(size=(b, tf, 8)).astype(np.float32),
        "olens": np.full((b,), tf, np.int32),
        "ilens": np.full((b,), 10, np.int32),
    }
    from jatts_tpu.train.steps import get_kwargs_fn

    model = E2TTS(idim=20, odim=8, dim=32, depth=2, heads=2, ff_mult=2)
    trainer = _run(
        model, get_loss_fn("E2TTSTrainer"), {}, batch,
        {"ema_decay": 0.999, "gradient_accumulate_steps": 2}, str(tmp_path),
        kwargs_fn=get_kwargs_fn("E2TTSTrainer"),
    )
    assert trainer.state.ema_params is not None


def test_valle_ar_trainer(tmp_path):
    from jatts_tpu.models.valle import VALLEAR

    rng = np.random.default_rng(3)
    b = 8
    batch = {
        "text": rng.integers(0, 32, (b, 6)).astype(np.int32),
        "text_lens": np.full((b,), 6, np.int32),
        "proms": rng.integers(0, 32, (b, 8, 8)).astype(np.int32),
        "prom_lens": np.full((b,), 8, np.int32),
        "resps": rng.integers(0, 32, (b, 10, 8)).astype(np.int32),
        "resp_lens": np.full((b,), 10, np.int32),
    }
    from jatts_tpu.train.steps import get_kwargs_fn

    model = VALLEAR(idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2)
    _run(model, get_loss_fn("VALLETrainer"), {}, batch, tmp=str(tmp_path),
         kwargs_fn=get_kwargs_fn("VALLETrainer"))
