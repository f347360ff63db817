"""E2-TTS: NAR flow-matching infill model (reference jatts/models/e2tts.py:55-320).

Training: random span mask (0.7-1.0 of frames), phi_t = (1-t)x0 + t*x1, CFG
drops (audio 0.3 / both 0.2), masked MSE on the flow. TPU-first deltas vs the
reference: per-sample CFG drops drawn in-jit (the reference draws one python
bool per step), and inference runs classifier-free guidance as a single
doubled-batch forward per Euler step instead of two sequential forwards, with
sway-sampled timesteps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jatts_tpu.modules.e2tts_backbone import UNetT
from jatts_tpu.ops.masks import sequence_mask


def mask_from_frac_lengths(rng, seq_len: jnp.ndarray, frac_min: float, frac_max: float, t_max: int):
    """Random contiguous span covering frac of each utterance
    (reference e2tts.py:30-52)."""
    r1, r2 = jax.random.split(rng)
    frac = jax.random.uniform(r1, seq_len.shape, minval=frac_min, maxval=frac_max)
    lengths = (frac * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    start = jnp.clip(
        (max_start * jax.random.uniform(r2, seq_len.shape)).astype(jnp.int32), 0, None
    )
    end = start + lengths
    pos = jnp.arange(t_max)[None, :]
    return (pos >= start[:, None]) & (pos < end[:, None])


class E2TTS(nn.Module):
    idim: int
    odim: int = 80
    backbone: str = "UNetT"
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    ff_mult: int = 4
    text_mask_padding: bool = False
    pe_attn_head: Optional[int] = 1
    sigma: float = 0.0
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: Tuple[float, float] = (0.7, 1.0)
    # 'xla' (default): measured faster than the stock Pallas flash kernel at
    # every S<=4096 on v5e-1 (e2tts train 264.1 vs 575.4 ms/step at the
    # recipe size — benchmarks/bench_flagship_profile.py); 'flash' stays
    # opt-in for memory-bound long-S cases ('auto' = flash only at S>4096).
    # No semantic delta either way.
    attn_backend: str = "xla"
    dtype: Any = jnp.float32
    use_remat: bool = False
    remat_policy: Optional[str] = None  # see UNetT.remat_policy

    def setup(self):
        if self.backbone != "UNetT":
            raise ValueError(f"Unsupported backbone: {self.backbone}")
        self.net = UNetT(
            text_num_embeds=self.idim,
            mel_dim=self.odim,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            ff_mult=self.ff_mult,
            text_mask_padding=self.text_mask_padding,
            pe_attn_head=self.pe_attn_head,
            attn_backend=self.attn_backend,
            dtype=self.dtype,
            use_remat=self.use_remat,
            remat_policy=self.remat_policy,
            name="backbone",
        )

    def __call__(
        self,
        text: jnp.ndarray,           # [B, N_t] ids, pad = -1
        feats: jnp.ndarray,          # [B, N, odim]
        feats_lengths: jnp.ndarray,  # [B]
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training loss (reference e2tts.py:120-187)."""
        rng = self.make_rng("noise")
        r_span, r_x0, r_t, r_drop_a, r_drop_c = jax.random.split(rng, 5)
        b, n, _ = feats.shape

        rand_span_mask = mask_from_frac_lengths(
            r_span, feats_lengths, *self.frac_lengths_mask, n
        )
        x1 = feats
        x0 = jax.random.normal(r_x0, x1.shape, dtype=x1.dtype)
        time = jax.random.uniform(r_t, (b,), dtype=x1.dtype)
        t = time[:, None, None]
        phi = (1.0 - t) * x0 + t * x1
        flow = x1 - x0
        cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

        drop_audio = jax.random.uniform(r_drop_a, (b,)) < self.audio_drop_prob
        drop_both = jax.random.uniform(r_drop_c, (b,)) < self.cond_drop_prob
        drop_audio = drop_audio | drop_both
        drop_text = drop_both

        mask = sequence_mask(feats_lengths, n)
        pred = self.net(
            phi, cond, text, time, drop_audio, drop_text, mask,
            deterministic=deterministic,
        )
        err = (pred - flow) ** 2
        sel = rand_span_mask[..., None].astype(err.dtype)
        loss = jnp.sum(err * sel) / jnp.maximum(jnp.sum(sel) * self.odim, 1.0)
        return {"loss": loss, "cond": cond, "pred": pred}

    def inference(
        self,
        cond: jnp.ndarray,       # [B, T_max, odim] prompt mel, zero-padded
        text: jnp.ndarray,       # [B, N_t] ids (prompt + target), pad = -1
        ref_lens: jnp.ndarray,   # [B] prompt frame counts
        duration: jnp.ndarray,   # [B] total output frames (prompt + gen)
        steps: int = 32,
        cfg_strength: float = 1.0,
        sway_sampling_coef: Optional[float] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Euler ODE with single-forward CFG (reference e2tts.py:189-320).
        ``cond.shape[1]`` is the static max duration."""
        rng = self.make_rng("noise")
        b, t_max, _ = cond.shape
        duration = jnp.clip(duration, 1, t_max)

        cond_mask = sequence_mask(ref_lens, t_max)[..., None]
        step_cond = jnp.where(cond_mask, cond, 0.0)
        mask = sequence_mask(duration, t_max)

        y = jax.random.normal(rng, (b, t_max, self.odim), dtype=cond.dtype)

        ts = jnp.linspace(0.0, 1.0, steps + 1)
        if sway_sampling_coef is not None:
            ts = ts + sway_sampling_coef * (jnp.cos(jnp.pi / 2 * ts) - 1 + ts)

        no_drop = jnp.zeros((b,), bool)
        yes_drop = jnp.ones((b,), bool)

        # text-embedding cache (reference unett.py:223-233, cache=True): the
        # cond/uncond text embeddings are step-invariant, so compute them
        # ONCE here and hand them to every ODE step as scan invariants —
        # the functional equivalent of the reference's text_cond/text_uncond
        # mutable cache. One doubled-batch embed call covers both CFG
        # branches.
        if cfg_strength < 1e-5:
            te = self.net(
                cond, step_cond, text, jnp.zeros((b,)), no_drop, no_drop,
                mask, deterministic=True, return_text_embed=True,
            )
            te2 = None
        else:
            tx2 = jnp.concatenate([text, text], axis=0)
            da = jnp.concatenate([no_drop, yes_drop], axis=0)
            te = None
            te2 = self.net(
                jnp.concatenate([cond, cond], axis=0),
                jnp.concatenate([step_cond, step_cond], axis=0),
                tx2, jnp.zeros((2 * b,)), da, da,
                jnp.concatenate([mask, mask], axis=0),
                deterministic=True, return_text_embed=True,
            )

        # lifted lax.scan over Euler steps: ONE UNetT body in the traced
        # program instead of `steps` copies (steps-times smaller HLO; the
        # unrolled 24L x 32-step variant was minutes of remote compile)
        import flax.linen as fnn

        def body(mdl, y, tdt):
            t_i, dt = tdt
            if cfg_strength < 1e-5:
                pred = mdl.net(
                    y, step_cond, text, jnp.full((b,), t_i), no_drop, no_drop,
                    mask, deterministic=True, text_embed=te,
                )
            else:
                # doubled-batch CFG: [cond; uncond] in one forward
                y2 = jnp.concatenate([y, y], axis=0)
                sc2 = jnp.concatenate([step_cond, step_cond], axis=0)
                m2 = jnp.concatenate([mask, mask], axis=0)
                da2 = jnp.concatenate([no_drop, yes_drop], axis=0)
                out = mdl.net(
                    y2, sc2, tx2, jnp.full((2 * b,), t_i), da2, da2, m2,
                    deterministic=True, text_embed=te2,
                )
                pred, null_pred = out[:b], out[b:]
                pred = pred + (pred - null_pred) * cfg_strength
            return y + dt * pred, None

        scan = fnn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False, "noise": False},
            in_axes=0,
            out_axes=0,
        )
        y, _ = scan(self, y, (ts[:-1], ts[1:] - ts[:-1]))

        out = jnp.where(cond_mask, cond, y)
        out = out * mask[..., None]
        return {"feat_gen": out, "olens": duration}
