"""Coverage for smaller modules: absolute/scaled positional encodings,
Prenet, conformer with abs pos enc + plain self-attention."""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.modules.conformer import ConformerEncoder
from jatts_tpu.modules.positional import (
    PositionalEncoding,
    ScaledPositionalEncoding,
    rel_sinusoid_table,
    sinusoid_table,
)
from jatts_tpu.modules.prenet_postnet import Prenet

RNGS = {"params": jax.random.key(0), "dropout": jax.random.key(1)}


def test_sinusoid_tables():
    t, d = 7, 8
    pe = sinusoid_table(t, d)
    assert pe.shape == (t, d)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-12)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-12)  # cos(0)
    rel = rel_sinusoid_table(t, d)
    assert rel.shape == (2 * t - 1, d)
    # center row is position 0
    np.testing.assert_allclose(rel[t - 1], pe[0], atol=1e-12)


def test_positional_encoding_modules():
    x = jnp.ones((2, 5, 8))
    pe = PositionalEncoding(8, dropout_rate=0.0)
    v = pe.init(RNGS, x)
    y = pe.apply(v, x)
    want = np.ones((2, 5, 8)) * np.sqrt(8) + sinusoid_table(5, 8)[None]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)

    spe = ScaledPositionalEncoding(8, dropout_rate=0.0, init_alpha=2.0)
    v = spe.init(RNGS, x)
    y = spe.apply(v, x)
    want = np.ones((2, 5, 8)) + 2.0 * sinusoid_table(5, 8)[None]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


def test_prenet_always_on_dropout():
    x = jnp.ones((2, 4, 8))
    pn = Prenet(n_layers=2, n_units=16, dropout_rate=0.5)
    v = pn.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    y1 = pn.apply(v, x, rngs={"dropout": jax.random.key(2)})
    y2 = pn.apply(v, x, rngs={"dropout": jax.random.key(3)})
    # dropout active by default even at "inference" (Tacotron2 convention)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    y_det = pn.apply(v, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(pn.apply(v, x, deterministic=True)), np.asarray(y_det)
    )


def test_conformer_abs_pos_and_plain_attention():
    enc = ConformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=32, num_blocks=1,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="embed", idim=11, pos_enc_layer_type="abs_pos",
        selfattention_layer_type="selfattn", macaron_style=False,
        use_cnn_module=False,
    )
    xs = jnp.array([[1, 2, 3, 4], [5, 6, 0, 0]])
    mask = jnp.array([[[True, True, True, True]], [[True, True, False, False]]])
    v = enc.init(RNGS, xs, mask)
    y = enc.apply(v, xs, mask, deterministic=True)
    assert y.shape == (2, 4, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_attn_backend_flash_falls_back_on_cpu():
    """attn_backend='flash' is gated to TPU backends at trace time; on CPU
    the module must silently take the XLA path with identical outputs."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.modules.attention import (
        LegacyRelPositionMultiHeadedAttention,
        _flash_ok,
    )
    from jatts_tpu.modules.positional import LegacyRelPositionalEncoding

    assert not _flash_ok("flash", None, 128, 128)  # CPU backend
    assert not _flash_ok("xla", None, 128, 128)

    b, t, d, h = 2, 128, 32, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = jnp.ones((b, 1, t), bool)
    _, pos = LegacyRelPositionalEncoding(d, dropout_rate=0.0).apply(
        {}, jnp.zeros((1, t, d)), deterministic=True
    )
    m_x = LegacyRelPositionMultiHeadedAttention(h, d, 0.0, attn_backend="xla")
    m_f = LegacyRelPositionMultiHeadedAttention(h, d, 0.0, attn_backend="flash")
    v = m_x.init(jax.random.key(0), x, x, x, pos, mask)
    a = m_x.apply(v, x, x, x, pos, mask, deterministic=True)
    c = m_f.apply(v, x, x, x, pos, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_attn_backend_auto_policy(monkeypatch):
    """'auto' = XLA at S<=FLASH_AUTO_MIN_LEN (2048 — tuned-block kernel wins
    real steps only beyond it, docs/ROUND4.md), flash beyond — the length
    gate applies before the platform gate, so short sequences resolve to XLA
    even on TPU."""
    import jax

    from jatts_tpu.modules import attention

    gate = attention.FLASH_AUTO_MIN_LEN
    # short sequences: XLA regardless of platform
    assert not attention._flash_ok("auto", None, 128, 128)
    assert not attention._flash_ok("auto", None, gate, gate)
    # long sequences: flash — but only on a TPU-class backend
    assert not attention._flash_ok("auto", None, 2 * gate, 2 * gate)  # CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert attention._flash_ok("auto", None, 2 * gate, 2 * gate)
    assert not attention._flash_ok("auto", None, gate, gate)
