"""Exactness of the fused rel-pos attention decomposition.

The flash path of RelPositionMultiHeadedAttention replaces the [B,H,T,T]
rel-pos bias with concatenated features: bd[i,j] == u_tilde(i)·phi(j)
(modules/attention.py:relpos_fused_features). The kernel itself only runs on
TPU; the algebraic identity — the thing that could silently be wrong — is
pinned here on CPU against the materialized rel_shift_gather path, for both
the full bias and the resulting attention output.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.modules.attention import (
    RelPositionMultiHeadedAttention,
    rel_shift_gather,
    relpos_fused_features,
)
from jatts_tpu.modules.positional import RelPositionalEncoding, rel_sinusoid_table


def test_relpos_fused_features_match_rel_shift():
    b, h, t, dk = 2, 4, 24, 8
    n_feat = h * dk
    rng = np.random.default_rng(0)
    q_v = jnp.asarray(rng.standard_normal((b, h, t, dk)).astype(np.float32))
    w_pos = jnp.asarray(rng.standard_normal((n_feat, n_feat)).astype(np.float32))

    pos_emb = jnp.asarray(rel_sinusoid_table(t, n_feat).astype(np.float32))
    p = (pos_emb @ w_pos).reshape(1, 2 * t - 1, h, dk).transpose(0, 2, 1, 3)
    bd_ref = rel_shift_gather(jnp.einsum("bhqd,xhpd->bhqp", q_v, p), t)

    ut, phi = relpos_fused_features(q_v, w_pos, t, n_feat)
    bd_fused = jnp.einsum("bhqf,kf->bhqk", ut, phi)
    np.testing.assert_allclose(
        np.asarray(bd_fused), np.asarray(bd_ref), rtol=1e-4, atol=1e-4
    )


def test_relpos_attention_fused_scores_match_module():
    """End-to-end scores: softmax((q_u·k + ũ·φ)/sqrt(dk)) v computed from the
    fused features equals the module's XLA path output."""
    b, t, n_feat, h = 2, 16, 32, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, n_feat)).astype(np.float32))
    pe_mod = RelPositionalEncoding(n_feat, 0.0)
    xs, pos_emb = pe_mod.apply({}, x, deterministic=True)

    mod = RelPositionMultiHeadedAttention(n_head=h, n_feat=n_feat, dropout_rate=0.0)
    variables = mod.init(
        {"params": jax.random.key(0)}, xs, xs, xs, pos_emb, deterministic=True
    )
    mask = jnp.asarray(np.array([[True] * 16, [True] * 12 + [False] * 4]))[:, None, :]
    want = mod.apply(variables, xs, xs, xs, pos_emb, mask, deterministic=True)

    # rebuild the fused computation outside the module from its params
    p = variables["params"]
    dk = n_feat // h

    def proj(name, inp):
        y = inp @ p[name]["kernel"] + p[name].get("bias", 0.0)
        return y.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

    q = proj("linear_q", xs)
    k = proj("linear_k", xs)
    v = proj("linear_v", xs)
    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    ut, phi = relpos_fused_features(q_v, p["linear_pos"]["kernel"], t, n_feat)
    q_cat = jnp.concatenate([q_u, ut], axis=-1)
    k_cat = jnp.concatenate(
        [k, jnp.broadcast_to(phi[None, None], (b, h, t, n_feat))], axis=-1
    )
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_cat, k_cat) / np.sqrt(dk)
    scores = jnp.where(mask[:, None], scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(mask[:, None], attn, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, n_feat)
    out = out @ p["linear_out"]["kernel"] + p["linear_out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5)
