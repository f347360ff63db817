"""Parity tests for VALL-E and E2-TTS against the ACTUAL reference code at
/root/reference (the two families round 2 verified only via in-repo torch
replicas — the shared-misunderstanding risk this file retires).

Reference modules exercised:
  - jatts/models/valle_ar.py + valle_base.py + valle/modules.py (AR training
    CE loss AND full classifier logits via a forward hook)
  - jatts/models/valle_nar.py (NAR training path with fixed quant levels,
    AdaLN blocks)
  - jatts/models/e2tts.py UNetT backbone (unett.py:116-272) for all CFG flag
    combinations (cond/uncond audio x cond/uncond text)

x_transformers (absent in-image) is provided by reference_loader as a
faithful reimplementation of the public library's RMSNorm/rotary pieces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import load_reference  # noqa: E402

from jatts_tpu.models.valle import VALLEAR, VALLENAR  # noqa: E402
from jatts_tpu.models.e2tts import E2TTS  # noqa: E402
from jatts_tpu.utils.torch_import import (  # noqa: E402
    convert_e2tts,
    convert_valle,
)

TINY = dict(idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2)


def _sd_numpy(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _valle_inputs(rng, b=2, tx=(6, 4), tp=(8, 5), tr=(10, 7), n_tokens=32):
    text = [torch.from_numpy(rng.integers(0, n_tokens, (t,)).astype(np.int64)) for t in tx]
    proms = [torch.from_numpy(rng.integers(0, n_tokens, (t, 8)).astype(np.int64)) for t in tp]
    resps = [torch.from_numpy(rng.integers(0, n_tokens, (t, 8)).astype(np.int64)) for t in tr]
    return text, proms, resps


def _pad_stack(lists, tmax, extra=()):
    out = np.zeros((len(lists), tmax, *extra), np.int32)
    for i, x in enumerate(lists):
        out[i, : len(x)] = x.numpy()
    return jnp.asarray(out)


def test_valle_ar_reference_parity():
    """AR training loss and full logits vs the real reference VALLEAR."""
    rvalle = load_reference("models.valle_ar")
    torch.manual_seed(0)
    ref = rvalle.VALLEAR(
        idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2, p_dropout=0.0
    ).eval()

    rng = np.random.default_rng(0)
    text, proms, resps = _valle_inputs(rng)
    resp0 = [r[:, 0] for r in resps]

    captured = {}
    ref.classifier.register_forward_hook(
        lambda m, i, o: captured.__setitem__("logits", o.detach())
    )
    with torch.no_grad():
        _, loss = ref(text, proms, resp0)
    want_loss = float(loss["nll"])
    want_logits = captured["logits"].numpy()  # [B, S_ref, V] (pre-mask)

    model = VALLEAR(**TINY, p_dropout=0.0, attn_backend="xla")
    variables = convert_valle(_sd_numpy(ref), model)
    tx, tp, tr = 6, 8, 10
    batch = dict(
        text=_pad_stack(text, tx),
        text_lens=jnp.array([6, 4]),
        proms=_pad_stack(proms, tp, (8,)),
        prom_lens=jnp.array([8, 5]),
        resps=_pad_stack(resp0, tr),
        resp_lens=jnp.array([10, 7]),
    )
    out = model.apply(variables, **batch, deterministic=True)
    np.testing.assert_allclose(float(out["loss"]), want_loss, rtol=2e-4)

    # per-sample logits over the live packed region
    ours = np.asarray(out["logits"])
    totals = [6 + 8 + 10 + 2, 4 + 5 + 7 + 2]
    for b in range(2):
        np.testing.assert_allclose(
            ours[b, : totals[b]], want_logits[b, : totals[b]], atol=2e-3
        )


def test_valle_nar_reference_parity():
    """NAR training path (AdaLN, level-conditioned) vs the real reference,
    with pinned quant levels on both sides."""
    rbase = load_reference("models.valle_base")
    rnar = load_reference("models.valle_nar")
    torch.manual_seed(1)
    ref = rnar.VALLENAR(
        idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2, p_dropout=0.0,
        n_resp_levels=7,
    ).eval()

    rng = np.random.default_rng(1)
    text, proms, resps = _valle_inputs(rng)
    ql = torch.tensor([2, 5])
    prev_list = [o[..., : int(l) + 1] for o, l in zip(resps, ql)]
    targ_list = [o[..., int(l) + 1] for o, l in zip(resps, ql)]

    captured = {}
    ref.classifier.register_forward_hook(
        lambda m, i, o: captured.__setitem__("logits", o.detach())
    )
    with torch.no_grad():
        _, loss = rbase.VALLEBase.forward(
            ref, text, proms, prev_list, targ_list,
            return_all_resp=True, shift_targ_list=False, quant_levels=ql,
        )
    want_loss = float(loss["nll"])
    want_logits = captured["logits"].numpy()

    model = VALLENAR(**TINY, p_dropout=0.0, n_resp_levels=7, attn_backend="xla")
    variables = convert_valle(_sd_numpy(ref), model)
    batch = dict(
        text=_pad_stack(text, 6),
        text_lens=jnp.array([6, 4]),
        proms=_pad_stack(proms, 8, (8,)),
        prom_lens=jnp.array([8, 5]),
        resps=_pad_stack(resps, 10, (8,)),
        resp_lens=jnp.array([10, 7]),
        quant_levels=jnp.array([2, 5]),
    )
    out = model.apply(variables, **batch, deterministic=True)
    np.testing.assert_allclose(float(out["loss"]), want_loss, rtol=2e-4)

    ours = np.asarray(out["logits"])
    totals = [6 + 8 + 10 + 2, 4 + 5 + 7 + 2]
    for b in range(2):
        np.testing.assert_allclose(
            ours[b, : totals[b]], want_logits[b, : totals[b]], atol=2e-3
        )


@pytest.mark.parametrize("drop_audio,drop_text", [(False, False), (True, False), (True, True)])
def test_e2tts_unett_reference_parity(drop_audio, drop_text):
    """UNetT backbone forward vs the real reference for every CFG flag
    combination used by training and doubled-batch CFG inference."""
    re2 = load_reference("models.e2tts")
    torch.manual_seed(2)
    ref = re2.E2TTS(
        idim=16, odim=8, backbone="UNetT", dim=32, depth=4, heads=2,
        ff_mult=2, text_mask_padding=False, pe_attn_head=1,
    ).eval()

    rng = np.random.default_rng(2)
    b, n, d = 2, 12, 8
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    cond = rng.standard_normal((b, n, d)).astype(np.float32)
    text = rng.integers(0, 16, (b, 7)).astype(np.int64)
    time = np.array([0.3, 0.8], np.float32)
    lens = np.array([12, 9])
    mask = (np.arange(n)[None, :] < lens[:, None])

    with torch.no_grad():
        want = ref.backbone(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(text),
            torch.from_numpy(time), drop_audio_cond=drop_audio,
            drop_text=drop_text, mask=torch.from_numpy(mask),
        ).numpy()

    model = E2TTS(
        idim=16, odim=8, dim=32, depth=4, heads=2, ff_mult=2,
        text_mask_padding=False, pe_attn_head=1, attn_backend="xla",
    )
    variables = convert_e2tts(_sd_numpy(ref), model)

    def run_backbone(v):
        return model.apply(
            v, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(time), jnp.full((b,), drop_audio),
            jnp.full((b,), drop_text), jnp.asarray(mask),
            deterministic=True,
            method=lambda m, *a, **k: m.net(*a, **k),
        )

    ours = np.asarray(run_backbone(variables))
    # compare live frames only (reference computes garbage into padding too,
    # but masks attention; conv pos-embed edge effects differ only in pad)
    for i in range(b):
        np.testing.assert_allclose(ours[i, : lens[i]], want[i, : lens[i]], atol=2e-3)
