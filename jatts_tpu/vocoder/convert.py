"""parallel_wavegan HiFi-GAN checkpoint (.pkl, torch) -> flax params.

The reference loads these checkpoints through the parallel_wavegan package
(jatts/vocoder/vocoder.py:16-55) and removes weight norm before inference; we
fold weight norm analytically (w = g * v/||v||) and remap names:

    input_conv.weight                      -> input_conv.kernel
    upsamples.{i}.1.weight                 -> upsample_{i}.kernel
    blocks.{k}.convs1.{j}.1.weight         -> blocks_{k}.convs1_{j}.kernel
    blocks.{k}.convs2.{j}.1.weight         -> blocks_{k}.convs2_{j}.kernel
    output_conv.1.weight                   -> output_conv.kernel
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch pickle without requiring CUDA; returns flat numpy dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "generator" in ckpt:
        ckpt = ckpt["generator"]
    return {k: _to_numpy(v) for k, v in ckpt.items()}


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold weight_g/weight_v pairs into plain weights."""
    out: Dict[str, np.ndarray] = {}
    done = set()
    for k in sd:
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = sd[base + "weight_g"]
            v = sd[k]
            norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1))
            w = v * (g.reshape(-1) / np.maximum(norm, 1e-12)).reshape(
                -1, *([1] * (v.ndim - 1))
            )
            out[base + "weight"] = w
            done.update({k, base + "weight_g"})
        elif k.endswith("weight_g"):
            continue
        elif k not in done:
            out[k] = sd[k]
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> flax ConvTranspose
    (transpose_kernel=True) [k, out, in]."""
    return np.transpose(w, (2, 1, 0))


def hifigan_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    sd = fold_weight_norm(sd)
    params: Dict[str, Any] = {}

    def put(path, kernel, bias):
        params[path] = {"kernel": kernel}
        if bias is not None:
            params[path]["bias"] = bias

    put("input_conv", _conv_w(sd["input_conv.weight"]), sd.get("input_conv.bias"))
    i = 0
    while f"upsamples.{i}.1.weight" in sd:
        put(
            f"upsample_{i}",
            _convT_w(sd[f"upsamples.{i}.1.weight"]),
            sd.get(f"upsamples.{i}.1.bias"),
        )
        i += 1
    k = 0
    while f"blocks.{k}.convs1.0.1.weight" in sd:
        blk: Dict[str, Any] = {}
        j = 0
        while f"blocks.{k}.convs1.{j}.1.weight" in sd:
            blk[f"convs1_{j}"] = {
                "kernel": _conv_w(sd[f"blocks.{k}.convs1.{j}.1.weight"]),
                "bias": sd[f"blocks.{k}.convs1.{j}.1.bias"],
            }
            if f"blocks.{k}.convs2.{j}.1.weight" in sd:
                blk[f"convs2_{j}"] = {
                    "kernel": _conv_w(sd[f"blocks.{k}.convs2.{j}.1.weight"]),
                    "bias": sd[f"blocks.{k}.convs2.{j}.1.bias"],
                }
            j += 1
        params[f"blocks_{k}"] = blk
        k += 1
    put("output_conv", _conv_w(sd["output_conv.1.weight"]), sd.get("output_conv.1.bias"))
    return {"params": params}
