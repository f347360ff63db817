"""Normalizing-flow components for the stochastic duration predictor
(reference jatts/modules/vits/flow.py:17-310, transform.py:17-216,
duration_predictor.py:128-301).

Feature-last [B, T, C] layout; masks [B, T, 1]. The piecewise rational
quadratic spline is fully vectorized with where-masking (the reference does
boolean-mask scatter updates, which are dynamic-shape ops) — jit-clean.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnorm_widths: jnp.ndarray,
    unnorm_heights: jnp.ndarray,
    unnorm_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'Linear-tails' piecewise-RQ spline (reference transform.py:52-216),
    vectorized: outside [-B, B] is identity; inside is the monotone RQ map."""
    num_bins = unnorm_widths.shape[-1]
    left = bottom = -tail_bound
    right = top = tail_bound

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    # pad derivatives with the boundary constant (transform.py:69-75)
    constant = np.log(np.exp(1.0 - min_derivative) - 1.0)
    unnorm_derivatives = jnp.pad(
        unnorm_derivatives, [(0, 0)] * (unnorm_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    widths = jax.nn.softmax(unnorm_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnorm_derivatives)

    heights = jax.nn.softmax(unnorm_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    locs = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(
        jnp.sum(x[..., None] >= locs.at[..., -1].add(1e-6), axis=-1) - 1,
        0, num_bins - 1,
    )[..., None]

    def gather(a):
        return jnp.take_along_axis(a, bin_idx, axis=-1)[..., 0]

    in_cumwidths = gather(cumwidths)
    in_widths = gather(widths)
    in_cumheights = gather(cumheights)
    delta = heights / widths
    in_delta = gather(delta)
    in_der = gather(derivatives)
    in_der_p1 = gather(derivatives[..., 1:])
    in_heights = gather(heights)

    if inverse:
        a = (x - in_cumheights) * (in_der + in_der_p1 - 2 * in_delta) + in_heights * (
            in_delta - in_der
        )
        b = in_heights * in_der - (x - in_cumheights) * (
            in_der + in_der_p1 - 2 * in_delta
        )
        c = -in_delta * (x - in_cumheights)
        disc = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(disc) - 1e-12)
        outputs = root * in_widths + in_cumwidths
        tom = root * (1 - root)
        denom = in_delta + (in_der + in_der_p1 - 2 * in_delta) * tom
        dnum = in_delta**2 * (
            in_der_p1 * root**2 + 2 * in_delta * tom + in_der * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(jnp.maximum(dnum, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12)))
    else:
        theta = (x - in_cumwidths) / jnp.maximum(in_widths, 1e-12)
        tom = theta * (1 - theta)
        numer = in_heights * (in_delta * theta**2 + in_der * tom)
        denom = in_delta + (in_der + in_der_p1 - 2 * in_delta) * tom
        outputs = in_cumheights + numer / denom
        dnum = in_delta**2 * (
            in_der_p1 * theta**2 + 2 * in_delta * tom + in_der * (1 - theta) ** 2
        )
        logabsdet = jnp.log(jnp.maximum(dnum, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12))

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet


class DilatedDepthSeparableConv(nn.Module):
    """reference vits/flow.py:129-210."""

    channels: int
    kernel_size: int
    layers: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        if g is not None:
            x = x + g
        for i in range(self.layers):
            dilation = self.kernel_size**i
            y = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(dilation,),
                feature_group_count=self.channels, padding="SAME",
                name=f"dw_{i}",
            )(x * x_mask)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), name=f"pw_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask


class ConvFlow(nn.Module):
    """Half-channel RQ-spline coupling (reference vits/flow.py:213-310)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    layers: int
    bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, inverse: bool = False, deterministic: bool = True):
        half = self.in_channels // 2
        xa, xb = jnp.split(x, [half], axis=-1)
        h = nn.Conv(self.hidden_channels, (1,), name="input_conv")(xa)
        h = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel_size, self.layers, name="dds_conv"
        )(h, x_mask, g=g, deterministic=deterministic)
        h = nn.Conv(
            half * (self.bins * 3 - 1), (1,), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="proj",
        )(h)
        h = h * x_mask  # [B, T, half*(3*bins-1)]
        b, t, _ = h.shape
        h = h.reshape(b, t, half, self.bins * 3 - 1)
        denom = float(np.sqrt(self.hidden_channels))
        uw = h[..., : self.bins] / denom
        uh = h[..., self.bins : 2 * self.bins] / denom
        ud = h[..., 2 * self.bins :]
        # [B, T, half] inputs; spline over last axis bins
        yb, logabsdet = rational_quadratic_spline(
            xb, uw, uh, ud, inverse=inverse, tail_bound=self.tail_bound
        )
        y = jnp.concatenate([xa, yb], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not inverse:
            return y, logdet
        return y


class ElementwiseAffineFlow(nn.Module):
    """reference vits/flow.py:75-112."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, inverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not inverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


def log_flow(x, x_mask, inverse=False, eps=1e-5):
    """reference vits/flow.py:42-72."""
    if not inverse:
        y = jnp.log(jnp.maximum(x, eps)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration predictor (reference duration_predictor.py:128-301).

    Training: returns per-sample NLL (B,). Inference: samples log-durations
    through the inverted flow.
    Feature-last: x [B, T, C], x_mask [B, T, 1], w [B, T, 1] durations.
    """

    channels: int = 192
    kernel_size: int = 3
    dropout_rate: float = 0.5
    flows: int = 4
    dds_conv_layers: int = 3
    global_channels: int = -1

    def setup(self):
        self.pre = nn.Conv(self.channels, (1,), name="pre")
        self.dds = DilatedDepthSeparableConv(
            self.channels, self.kernel_size, self.dds_conv_layers,
            self.dropout_rate, name="dds",
        )
        self.proj = nn.Conv(self.channels, (1,), name="proj")
        self.aff = ElementwiseAffineFlow(2, name="flows_0")
        self.conv_flows = [
            ConvFlow(2, self.channels, self.kernel_size, self.dds_conv_layers,
                     name=f"flows_{i + 1}")
            for i in range(self.flows)
        ]
        self.post_pre = nn.Conv(self.channels, (1,), name="post_pre")
        self.post_dds = DilatedDepthSeparableConv(
            self.channels, self.kernel_size, self.dds_conv_layers,
            self.dropout_rate, name="post_dds",
        )
        self.post_proj = nn.Conv(self.channels, (1,), name="post_proj")
        self.post_aff = ElementwiseAffineFlow(2, name="post_flows_0")
        self.post_conv_flows = [
            ConvFlow(2, self.channels, self.kernel_size, self.dds_conv_layers,
                     name=f"post_flows_{i + 1}")
            for i in range(self.flows)
        ]
        if self.global_channels > 0:
            self.global_conv = nn.Conv(self.channels, (1,), name="global_conv")

    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        w: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        inverse: bool = False,
        noise_scale: float = 1.0,
        deterministic: bool = True,
    ):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            x = x + self.global_conv(jax.lax.stop_gradient(g))
        x = self.dds(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        if not inverse:
            assert w is not None, "w must be provided"
            h_w = self.post_pre(w)
            h_w = self.post_dds(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask
            e_q = (
                jax.random.normal(self.make_rng("noise"), (*w.shape[:2], 2), w.dtype)
                * x_mask
            )
            z_q = e_q
            logdet_tot_q = 0.0
            z_q, ld = self.post_aff(z_q, x_mask)
            logdet_tot_q += ld
            for flow in self.post_conv_flows:
                z_q, ld = flow(z_q, x_mask, g=(x + h_w), deterministic=deterministic)
                logdet_tot_q += ld
                z_q = z_q[..., ::-1]  # FlipFlow
            z_u, z1 = jnp.split(z_q, 2, axis=-1)
            u = nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (nn.log_sigmoid(z_u) + nn.log_sigmoid(-z_u)) * x_mask, axis=(1, 2)
            )
            logq = (
                jnp.sum(-0.5 * (np.log(2 * np.pi) + e_q**2) * x_mask, axis=(1, 2))
                - logdet_tot_q
            )

            z0, logdet_tot = log_flow(z0, x_mask)
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self.aff(z, x_mask)
            logdet_tot += ld
            for flow in self.conv_flows:
                z, ld = flow(z, x_mask, g=x, deterministic=deterministic)
                logdet_tot += ld
                z = z[..., ::-1]
            nll = (
                jnp.sum(0.5 * (np.log(2 * np.pi) + z**2) * x_mask, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq  # (B,)

        # inference: reference inverts [flip, cf_{n-1}, flip, ..., cf_1, flip,
        # aff] — the FIRST conv flow is skipped ("remove a useless vflow",
        # duration_predictor.py:283-284, matching upstream VITS)
        z = (
            jax.random.normal(self.make_rng("noise"), (*x.shape[:2], 2), x.dtype)
            * noise_scale
        )
        for flow in list(reversed(self.conv_flows))[:-1]:
            z = z[..., ::-1]
            z = flow(z, x_mask, g=x, inverse=True, deterministic=deterministic)
        z = z[..., ::-1]
        z = self.aff(z, x_mask, inverse=True)
        z0, _ = jnp.split(z, 2, axis=-1)
        w = jnp.exp(z0) * x_mask
        return jnp.ceil(w)[..., 0]  # [B, T]
