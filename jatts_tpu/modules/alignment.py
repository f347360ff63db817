"""Alignment learning module (reference jatts/modules/alignments.py:12-60).

Text/feat conv embeddings -> negative L2 distance -> log-softmax attention.
The Viterbi search over the resulting lattice lives in jatts_tpu.ops.mas.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_MASK_VAL = -1e9


class AlignmentModule(nn.Module):
    adim: int
    odim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, feats, x_masks=None):
        """text: [B, T_text, adim]; feats: [B, T_feats, odim];
        x_masks: [B, T_text] True on VALID tokens.
        Returns log_p_attn [B, T_feats, T_text]."""
        t = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype, name="t_conv1")(text))
        t = nn.Conv(self.adim, (1,), dtype=self.dtype, name="t_conv2")(t)

        f = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype, name="f_conv1")(feats))
        f = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype, name="f_conv2")(f))
        f = nn.Conv(self.adim, (1,), dtype=self.dtype, name="f_conv3")(f)

        # -||f_i - t_j||_2 via the expanded quadratic form (MXU-friendly:
        # one batched matmul instead of a [B, T_feats, T_text, adim] broadcast)
        f2 = jnp.sum(f**2, axis=-1)[:, :, None]
        t2 = jnp.sum(t**2, axis=-1)[:, None, :]
        ft = jnp.einsum("bfc,btc->bft", f, t, preferred_element_type=jnp.float32)
        dist_sq = jnp.maximum(f2 - 2.0 * ft + t2, 0.0)
        score = -jnp.sqrt(dist_sq + 1e-12)

        if x_masks is not None:
            score = jnp.where(x_masks[:, None, :], score, _MASK_VAL)
        return nn.log_softmax(score, axis=-1)
