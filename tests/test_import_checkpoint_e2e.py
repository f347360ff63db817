"""End-to-end checkpoint import: a reference-format .pkl written from the
ACTUAL reference FastSpeech2 class round-trips through the import_checkpoint
CLI into an orbax checkpoint whose restored params reproduce the torch
forward.

Chain under test: reference trainer pkl layout (trainers/base.py:85-105:
{"model": state_dict, "optimizer": ..., "scheduler": ..., "steps", "epochs"})
-> bin/import_checkpoint.py main() (argv-driven, like the shell recipes call
it) -> orbax save -> find_latest_checkpoint/restore_checkpoint -> model
built from the experiment yaml -> forward parity vs torch.
"""

import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402

MODEL_PARAMS = dict(
    adim=32, aheads=2, elayers=2, eunits=64, dlayers=2, dunits=64,
    conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    duration_predictor_layers=2, duration_predictor_chans=16,
    pitch_predictor_layers=2, pitch_predictor_chans=16,
    pitch_predictor_kernel_size=5, energy_predictor_chans=16,
    postnet_layers=3, postnet_chans=16, postnet_filts=5,
    transformer_enc_dropout_rate=0.0,
    transformer_enc_positional_dropout_rate=0.0,
    transformer_enc_attn_dropout_rate=0.0,
    transformer_dec_dropout_rate=0.0,
    transformer_dec_positional_dropout_rate=0.0,
    transformer_dec_attn_dropout_rate=0.0,
    duration_predictor_dropout_rate=0.0, pitch_predictor_dropout=0.0,
    energy_predictor_dropout=0.0, postnet_dropout_rate=0.0,
)
VOCAB, ODIM = 20, 10

# reference-side extras needed to build the same architecture in torch
REF_ONLY_PARAMS = dict(
    postnet_dropout_rate=0.0, positionwise_layer_type="conv1d",
    positionwise_conv_kernel_size=3, encoder_type="conformer",
    decoder_type="conformer", duration_predictor_kernel_size=3,
    pitch_embed_kernel_size=1, pitch_embed_dropout=0.0,
    energy_predictor_layers=2, energy_predictor_kernel_size=3,
    energy_embed_kernel_size=1, energy_embed_dropout=0.0,
)


def test_import_checkpoint_cli_roundtrip(tmp_path, monkeypatch):
    rfs2 = load_reference("models.fastspeech2")
    torch.manual_seed(7)
    ref_kwargs = {
        k: v for k, v in {**MODEL_PARAMS, **REF_ONLY_PARAMS}.items()
    }
    tmodel = rfs2.FastSpeech2(idim=VOCAB, odim=ODIM, **ref_kwargs).eval()

    # 1. write the pkl exactly as the reference trainer does
    pkl = tmp_path / "checkpoint-50000steps.pkl"
    torch.save(
        {
            "model": tmodel.state_dict(),
            "optimizer": {}, "scheduler": {}, "steps": 50000, "epochs": 3,
        },
        str(pkl),
    )

    # 2. experiment yaml + token list (idim comes from the token list,
    #    as tts_decode/tts_train resolve it)
    config = {"model_type": "FastSpeech2",
              "model_params": {"odim": ODIM, **MODEL_PARAMS}}
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("".join(f"tok{i}\n" for i in range(VOCAB)))

    # 3. drive the CLI main() through argv, like the recipes do
    outdir = tmp_path / "imported"
    from jatts_tpu.bin import import_checkpoint

    monkeypatch.setattr(
        sys, "argv",
        ["import_checkpoint.py", "--checkpoint", str(pkl),
         "--config", str(cfg_path), "--token-list", str(tokens),
         "--out", str(outdir)],
    )
    import_checkpoint.main()

    # 4. restore and run the jax model built from the same yaml
    import jax.numpy as jnp

    from jatts_tpu.models import get_model
    from jatts_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
    )

    ckpt = find_latest_checkpoint(str(outdir))
    assert ckpt is not None
    state = restore_checkpoint(ckpt)
    model = get_model("FastSpeech2")(idim=VOCAB, **config["model_params"])

    rng = np.random.default_rng(0)
    b, t_text = 2, 7
    xs = rng.integers(1, VOCAB, (b, t_text))
    ds = rng.integers(2, 7, (b, t_text))
    t_feats = int(ds.sum(axis=1).max())
    for i in range(b):
        ds[i, -1] += t_feats - ds[i].sum()
    ys = rng.normal(size=(b, t_feats, ODIM)).astype(np.float32)
    ps = rng.normal(size=(b, t_text, 1)).astype(np.float32)
    es = rng.normal(size=(b, t_text, 1)).astype(np.float32)
    ilens = np.full((b,), t_text, np.int64)
    olens = np.full((b,), t_feats, np.int64)

    with torch.no_grad():
        before_t, *_ = tmodel._forward(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens),
            ds=torch.from_numpy(ds), ps=torch.from_numpy(ps),
            es=torch.from_numpy(es),
        )

    out = model.apply(
        {"params": state["params"], "batch_stats": state.get("batch_stats", {})},
        jnp.array(xs), jnp.array(ilens), jnp.array(ys), jnp.array(olens),
        jnp.array(ds), jnp.array(ps), jnp.array(es), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["before_outs"]), before_t.numpy(), rtol=2e-3, atol=2e-4
    )


def _run_import_cli(monkeypatch, pkl, cfg_path, tokens, outdir, extra=()):
    from jatts_tpu.bin import import_checkpoint

    monkeypatch.setattr(
        sys, "argv",
        ["import_checkpoint.py", "--checkpoint", str(pkl),
         "--config", str(cfg_path), "--token-list", str(tokens),
         "--out", str(outdir), *extra],
    )
    import_checkpoint.main()

    from jatts_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
    )

    ckpt = find_latest_checkpoint(str(outdir))
    assert ckpt is not None
    return restore_checkpoint(ckpt)


def test_import_checkpoint_cli_e2tts_ema(tmp_path, monkeypatch):
    """Reference E2-TTS checkpoint format (trainers/e2tts.py:155-173:
    model_state_dict + ema_model_state_dict w/ 'ema_model.' prefixes +
    update) -> CLI -> restored params reproduce the torch EMA backbone."""
    re2 = load_reference("models.e2tts")
    torch.manual_seed(3)
    tmodel = re2.E2TTS(
        idim=16, odim=8, backbone="UNetT", dim=32, depth=4, heads=2,
        ff_mult=2,
    ).eval()
    # an EMA copy with genuinely different weights, so the test fails if the
    # importer silently picks the raw model weights
    torch.manual_seed(4)
    ema_model = re2.E2TTS(
        idim=16, odim=8, backbone="UNetT", dim=32, depth=4, heads=2,
        ff_mult=2,
    ).eval()
    pkl = tmp_path / "checkpoint-1000steps.pkl"
    torch.save(
        {
            "model_state_dict": tmodel.state_dict(),
            "ema_model_state_dict": {
                "initted": torch.tensor(True), "step": torch.tensor(1000),
                **{f"ema_model.{k}": v for k, v in ema_model.state_dict().items()},
            },
            "optimizer_state_dict": {}, "scheduler_state_dict": {},
            "update": 1000,
        },
        str(pkl),
    )
    config = {
        "model_type": "E2TTS",
        "model_params": dict(odim=8, backbone="UNetT", dim=32, depth=4,
                             heads=2, ff_mult=2),
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("".join(f"tok{i}\n" for i in range(16)))

    state = _run_import_cli(monkeypatch, pkl, cfg_path, tokens, tmp_path / "imp")

    import jax.numpy as jnp

    from jatts_tpu.models import get_model

    model = get_model("E2TTS")(idim=16, attn_backend="xla", **config["model_params"])
    rng = np.random.default_rng(3)
    b, n, d = 2, 12, 8
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    cond = rng.standard_normal((b, n, d)).astype(np.float32)
    text = rng.integers(0, 16, (b, 7)).astype(np.int64)
    time = np.array([0.25, 0.75], np.float32)
    with torch.no_grad():
        want = ema_model.backbone(
            torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text), torch.from_numpy(time),
            drop_audio_cond=False, drop_text=False,
        ).numpy()
    ours = model.apply(
        {"params": state["params"]},
        jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), jnp.zeros((b,), bool), jnp.zeros((b,), bool), None,
        deterministic=True, method=lambda m, *a, **k: m.net(*a, **k),
    )
    np.testing.assert_allclose(np.asarray(ours), want, atol=2e-3)


def test_import_checkpoint_cli_valle(tmp_path, monkeypatch):
    """Reference VALL-E trainer pkl ({"model": state_dict, ...},
    trainers/base.py:85-105) -> CLI for both AR and NAR model_types."""
    rvalle_ar = load_reference("models.valle_ar")
    rvalle_nar = load_reference("models.valle_nar")
    import jax.numpy as jnp

    from jatts_tpu.models import get_model

    rng = np.random.default_rng(4)
    text = [torch.from_numpy(rng.integers(0, 32, (t,)).astype(np.int64)) for t in (6, 4)]
    proms = [torch.from_numpy(rng.integers(0, 32, (t, 8)).astype(np.int64)) for t in (8, 5)]
    resps = [torch.from_numpy(rng.integers(0, 32, (t, 8)).astype(np.int64)) for t in (10, 7)]

    def pad(lists, tmax, extra=()):
        out = np.zeros((len(lists), tmax, *extra), np.int32)
        for i, v in enumerate(lists):
            out[i, : len(v)] = v.numpy()
        return jnp.asarray(out)

    batch = dict(
        text=pad(text, 6), text_lens=jnp.array([6, 4]),
        proms=pad(proms, 8, (8,)), prom_lens=jnp.array([8, 5]),
        resp_lens=jnp.array([10, 7]),
    )

    for model_type, ref_cls in (
        ("VALLEAR", rvalle_ar.VALLEAR), ("VALLENAR", rvalle_nar.VALLENAR)
    ):
        torch.manual_seed(5)
        tmodel = ref_cls(
            idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2,
            p_dropout=0.0,
        ).eval()
        pkl = tmp_path / f"ckpt_{model_type}" / "checkpoint-200steps.pkl"
        pkl.parent.mkdir()
        torch.save(
            {"model": tmodel.state_dict(), "optimizer": {}, "scheduler": {},
             "steps": 200, "epochs": 1},
            str(pkl),
        )
        config = {
            "model_type": model_type,
            "model_params": dict(n_tokens=32, d_model=32, n_heads=2,
                                 n_layers=2, p_dropout=0.0),
        }
        cfg_path = tmp_path / f"config_{model_type}.yml"
        cfg_path.write_text(yaml.safe_dump(config))
        tokens = tmp_path / "tokens.txt"
        tokens.write_text("".join(f"tok{i}\n" for i in range(32)))

        state = _run_import_cli(
            monkeypatch, pkl, cfg_path, tokens, tmp_path / f"imp_{model_type}"
        )
        model = get_model(model_type)(
            idim=32, attn_backend="xla", **config["model_params"]
        )
        if model_type == "VALLEAR":
            with torch.no_grad():
                _, loss = tmodel(text, proms, [r[:, 0] for r in resps])
            out = model.apply(
                {"params": state["params"]},
                resps=pad([r[:, 0] for r in resps], 10), **batch,
                deterministic=True,
            )
        else:
            ql = torch.tensor([1, 4])
            rbase = load_reference("models.valle_base")
            with torch.no_grad():
                _, loss = rbase.VALLEBase.forward(
                    tmodel, text, proms,
                    [o[..., : int(l) + 1] for o, l in zip(resps, ql)],
                    [o[..., int(l) + 1] for o, l in zip(resps, ql)],
                    return_all_resp=True, shift_targ_list=False,
                    quant_levels=ql,
                )
            out = model.apply(
                {"params": state["params"]},
                resps=pad(resps, 10, (8,)), quant_levels=jnp.array([1, 4]),
                **batch, deterministic=True,
            )
        np.testing.assert_allclose(
            float(out["loss"]), float(loss["nll"]), rtol=2e-4
        )
