"""PyTorch reference checkpoint -> flax params importer.

The BASELINE north-star requires loading the reference's PyTorch checkpoints
(``checkpoint-{N}steps.pkl`` = {"model": state_dict, ...},
reference trainers/base.py:85-105) into our models and matching outputs.
This module maps reference state_dict names onto our flax trees.

Conventions:
    torch Linear  [out, in]     -> flax Dense kernel [in, out]
    torch Conv1d  [out, in, k]  -> flax Conv kernel [k, in, out]
    torch depthwise Conv1d [C, 1, k] -> flax kernel [k, 1, C]
    torch Embedding             -> flax Embed embedding
    torch LayerNorm/BatchNorm weight/bias -> scale/bias (+ batch_stats)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def t_linear(sd, name):
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def t_conv1d(sd, name, depthwise=False):
    w = sd[f"{name}.weight"]
    if depthwise:
        kernel = np.transpose(w, (2, 1, 0))  # [C,1,k] -> [k,1,C]
    else:
        kernel = np.transpose(w, (2, 1, 0))  # [out,in,k] -> [k,in,out]
    p = {"kernel": kernel}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def t_norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def t_embed(sd, name):
    return {"embedding": sd[f"{name}.weight"]}


def t_bn(sd, name) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _mha(sd, prefix, rel_pos=True):
    p = {
        "linear_q": t_linear(sd, f"{prefix}.linear_q"),
        "linear_k": t_linear(sd, f"{prefix}.linear_k"),
        "linear_v": t_linear(sd, f"{prefix}.linear_v"),
        "linear_out": t_linear(sd, f"{prefix}.linear_out"),
    }
    if rel_pos:
        p["linear_pos"] = t_linear(sd, f"{prefix}.linear_pos")
        p["pos_bias_u"] = sd[f"{prefix}.pos_bias_u"]
        p["pos_bias_v"] = sd[f"{prefix}.pos_bias_v"]
    return p


def _ffn_conv(sd, prefix):
    return {"w_1": t_conv1d(sd, f"{prefix}.w_1"), "w_2": t_conv1d(sd, f"{prefix}.w_2")}


def convert_conformer_encoder(
    sd: Dict[str, np.ndarray], prefix: str, num_blocks: int,
    has_embed: bool = False, macaron: bool = True, use_cnn: bool = True,
    rel_pos: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """reference conformer Encoder (conformer/encoder.py) -> our
    ConformerEncoder params + batch_stats."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    if has_embed:
        params["embed_tok"] = t_embed(sd, f"{prefix}.embed.0")
    for i in range(num_blocks):
        bp = f"{prefix}.encoders.{i}"
        layer: Dict[str, Any] = {}
        layer_bs: Dict[str, Any] = {}
        if macaron:
            layer["norm_ff_macaron"] = t_norm(sd, f"{bp}.norm_ff_macaron")
            layer["feed_forward_macaron"] = _ffn_conv(sd, f"{bp}.feed_forward_macaron")
        layer["norm_mha"] = t_norm(sd, f"{bp}.norm_mha")
        layer["self_attn"] = _mha(sd, f"{bp}.self_attn", rel_pos=rel_pos)
        if use_cnn:
            layer["norm_conv"] = t_norm(sd, f"{bp}.norm_conv")
            bn_p, bn_s = t_bn(sd, f"{bp}.conv_module.norm")
            layer["conv_module"] = {
                "pointwise_conv1": t_conv1d(sd, f"{bp}.conv_module.pointwise_conv1"),
                "depthwise_conv": t_conv1d(sd, f"{bp}.conv_module.depthwise_conv", depthwise=True),
                "norm": bn_p,
                "pointwise_conv2": t_conv1d(sd, f"{bp}.conv_module.pointwise_conv2"),
            }
            layer_bs["conv_module"] = {"norm": bn_s}
            layer["norm_final"] = t_norm(sd, f"{bp}.norm_final")
        layer["norm_ff"] = t_norm(sd, f"{bp}.norm_ff")
        layer["feed_forward"] = _ffn_conv(sd, f"{bp}.feed_forward")
        params[f"encoders_{i}"] = layer
        if layer_bs:
            batch_stats[f"encoders_{i}"] = layer_bs
    if f"{prefix}.after_norm.weight" in sd:
        params["after_norm"] = t_norm(sd, f"{prefix}.after_norm")
    return params, batch_stats


def _predictor_stack(sd, prefix, n_layers):
    conv = {}
    for i in range(n_layers):
        conv[f"conv_{i}"] = t_conv1d(sd, f"{prefix}.conv.{i}.0")
        conv[f"norm_{i}"] = t_norm(sd, f"{prefix}.conv.{i}.2")
    return {"conv": conv, "linear": t_linear(sd, f"{prefix}.linear")}


def convert_fastspeech2(
    sd: Dict[str, np.ndarray], model
) -> Dict[str, Any]:
    """reference jatts/models/fastspeech2.py state_dict -> flax variables."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    enc_p, enc_bs = convert_conformer_encoder(
        sd, "encoder", model.elayers, has_embed=True,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
    )
    params["encoder"] = enc_p
    if enc_bs:
        batch_stats["encoder"] = enc_bs

    dec_p, dec_bs = convert_conformer_encoder(
        sd, "decoder", model.dlayers, has_embed=False,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
    )
    params["decoder"] = dec_p
    if dec_bs:
        batch_stats["decoder"] = dec_bs

    params["duration_predictor"] = _predictor_stack(
        sd, "duration_predictor", model.duration_predictor_layers
    )
    params["pitch_predictor"] = _predictor_stack(
        sd, "pitch_predictor", model.pitch_predictor_layers
    )
    params["energy_predictor"] = _predictor_stack(
        sd, "energy_predictor", model.energy_predictor_layers
    )
    params["pitch_embed"] = t_conv1d(sd, "pitch_embed.0")
    params["energy_embed"] = t_conv1d(sd, "energy_embed.0")
    params["feat_out"] = t_linear(sd, "feat_out")

    if model.postnet_layers > 0:
        pn: Dict[str, Any] = {}
        pn_bs: Dict[str, Any] = {}
        for i in range(model.postnet_layers):
            pn[f"conv_{i}"] = t_conv1d(sd, f"postnet.postnet.{i}.0")
            if model.use_batch_norm:
                bnp, bns = t_bn(sd, f"postnet.postnet.{i}.1")
                pn[f"bn_{i}"] = bnp
                pn_bs[f"bn_{i}"] = bns
        params["postnet"] = pn
        if pn_bs:
            batch_stats["postnet"] = pn_bs

    if getattr(model, "spk_embed_dim", None):
        params["projection"] = t_linear(sd, "projection")
    if getattr(model, "spks", None) and model.spks > 1:
        params["sid_emb"] = t_embed(sd, "sid_emb")

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _matcha_block1d(sd, prefix):
    """Block1D: conv + GroupNorm (reference matchatts/decoder.py:66-78)."""
    return {
        "conv": t_conv1d(sd, f"{prefix}.block.0"),
        "norm": _gn(sd, f"{prefix}.block.1"),
    }


def _matcha_resnet(sd, prefix):
    """ResnetBlock1D (reference matchatts/decoder.py:80-97)."""
    return {
        "block1": _matcha_block1d(sd, f"{prefix}.block1"),
        "mlp": t_linear(sd, f"{prefix}.mlp.1"),
        "block2": _matcha_block1d(sd, f"{prefix}.block2"),
        "res_conv": t_conv1d(sd, f"{prefix}.res_conv"),
    }


def _matcha_tf_block(sd, prefix):
    """BasicTransformerBlock w/ SnakeBeta FF
    (reference matchatts/transformer.py:28-364)."""
    return {
        "norm1": t_norm(sd, f"{prefix}.norm1"),
        "to_q": {"kernel": sd[f"{prefix}.attn1.to_q.weight"].T},
        "to_k": {"kernel": sd[f"{prefix}.attn1.to_k.weight"].T},
        "to_v": {"kernel": sd[f"{prefix}.attn1.to_v.weight"].T},
        "to_out": t_linear(sd, f"{prefix}.attn1.to_out.0"),
        "norm3": t_norm(sd, f"{prefix}.norm3"),
        "ff": {
            "proj": t_linear(sd, f"{prefix}.ff.net.0.proj"),
            "alpha": sd[f"{prefix}.ff.net.0.alpha"],
            "beta": sd[f"{prefix}.ff.net.0.beta"],
            "out": t_linear(sd, f"{prefix}.ff.net.2"),
        },
    }


def _convT1d(sd, name):
    """torch ConvTranspose1d [in, out, k] -> flax transpose_kernel=True
    kernel [k, out, in]."""
    p = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def convert_matcha_estimator(
    sd: Dict[str, np.ndarray], prefix: str, n_channels: int, n_blocks: int,
    num_mid_blocks: int,
) -> Dict[str, Any]:
    """reference matchatts/decoder.py Decoder -> our MatchaDecoder params.

    ``prefix`` is the torch module path of the estimator (e.g.
    'decoder.estimator'); ``n_channels`` = len(decoder_channels)."""
    p: Dict[str, Any] = {}
    p["time_mlp"] = {
        "linear_1": t_linear(sd, f"{prefix}.time_mlp.linear_1"),
        "linear_2": t_linear(sd, f"{prefix}.time_mlp.linear_2"),
    }
    for i in range(n_channels):
        p[f"down_resnet_{i}"] = _matcha_resnet(sd, f"{prefix}.down_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"down_tf_{i}_{j}"] = _matcha_tf_block(sd, f"{prefix}.down_blocks.{i}.1.{j}")
        ds_name = f"{prefix}.down_blocks.{i}.2"
        if f"{ds_name}.conv.weight" in sd:  # Downsample1D wraps its conv
            p[f"downsample_{i}"] = t_conv1d(sd, f"{ds_name}.conv")
        else:
            p[f"downsample_{i}"] = t_conv1d(sd, ds_name)
    for i in range(num_mid_blocks):
        p[f"mid_resnet_{i}"] = _matcha_resnet(sd, f"{prefix}.mid_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"mid_tf_{i}_{j}"] = _matcha_tf_block(sd, f"{prefix}.mid_blocks.{i}.1.{j}")
    for i in range(n_channels):
        p[f"up_resnet_{i}"] = _matcha_resnet(sd, f"{prefix}.up_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"up_tf_{i}_{j}"] = _matcha_tf_block(sd, f"{prefix}.up_blocks.{i}.1.{j}")
        us_name = f"{prefix}.up_blocks.{i}.2"
        if f"{us_name}.conv.weight" in sd:  # Upsample1D (ConvTranspose)
            p[f"upsample_{i}"] = _convT1d(sd, f"{us_name}.conv")
        else:
            p[f"upsample_{i}"] = t_conv1d(sd, us_name)
    p["final_block"] = _matcha_block1d(sd, f"{prefix}.final_block")
    p["final_proj"] = t_conv1d(sd, f"{prefix}.final_proj")
    return p


def convert_matchatts(sd: Dict[str, np.ndarray], model) -> Dict[str, Any]:
    """reference jatts/models/matchatts.py state_dict -> flax variables
    (also covers MatchaTTS_MAS; adds alignment_module when present)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    enc_p, enc_bs = convert_conformer_encoder(
        sd, "encoder", model.elayers, has_embed=True,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
    )
    params["encoder"] = enc_p
    if enc_bs:
        batch_stats["encoder"] = enc_bs
    params["duration_predictor"] = _predictor_stack(
        sd, "duration_predictor", model.duration_predictor_layers
    )
    params["encoder_proj"] = t_linear(sd, "encoder_proj")
    params["decoder"] = {
        "estimator": convert_matcha_estimator(
            sd, "decoder.estimator", len(model.decoder_channels),
            model.decoder_n_blocks, model.decoder_num_mid_blocks,
        )
    }
    if "alignment_module.t_conv1.weight" in sd:
        params["alignment_module"] = {
            "t_conv1": t_conv1d(sd, "alignment_module.t_conv1"),
            "t_conv2": t_conv1d(sd, "alignment_module.t_conv2"),
            "f_conv1": t_conv1d(sd, "alignment_module.f_conv1"),
            "f_conv2": t_conv1d(sd, "alignment_module.f_conv2"),
            "f_conv3": t_conv1d(sd, "alignment_module.f_conv3"),
        }
    if getattr(model, "spk_embed_dim", None):
        params["projection"] = t_linear(sd, "projection")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def _wn_conv(sd, name):
    """torch weight_norm Conv1d (weight_g [out,1,1] + weight_v [out,in,k])
    -> our WNConv params (v [k,in,out], g [out], b)."""
    p = {
        "v": np.transpose(sd[f"{name}.weight_v"], (2, 1, 0)),
        "g": sd[f"{name}.weight_g"].reshape(-1),
    }
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def convert_wavenet(sd, prefix, layers, has_global=False):
    """reference jatts/modules/wavenet/wavenet.py (weight-normed convs)."""
    p: Dict[str, Any] = {}
    for i in range(layers):
        lp = f"{prefix}.conv_layers.{i}"
        layer = {
            "conv": _wn_conv(sd, f"{lp}.conv"),
            "conv1x1_out": _wn_conv(sd, f"{lp}.conv1x1_out"),
        }
        if has_global and f"{lp}.conv1x1_glo.weight_v" in sd:
            layer["conv1x1_glo"] = _wn_conv(sd, f"{lp}.conv1x1_glo")
        p[f"conv_layers_{i}"] = layer
    return p


def convert_posterior_encoder(sd, prefix, layers, has_global=False):
    """reference vits/posterior_encoder.py:18-115."""
    return {
        "input_conv": t_conv1d(sd, f"{prefix}.input_conv"),
        "encoder": convert_wavenet(sd, f"{prefix}.encoder", layers, has_global),
        "proj": t_conv1d(sd, f"{prefix}.proj"),
    }


def convert_flow(sd, prefix, flows, layers, has_global=False):
    """reference vits/residual_coupling.py:18-227 — couplings at even torch
    indices (odd are FlipFlows with no params)."""
    p: Dict[str, Any] = {}
    for i in range(flows):
        fp = f"{prefix}.flows.{2 * i}"
        p[f"flows_{2 * i}"] = {
            "input_conv": t_conv1d(sd, f"{fp}.input_conv"),
            "encoder": convert_wavenet(sd, f"{fp}.encoder", layers, has_global),
            "proj": t_conv1d(sd, f"{fp}.proj"),
        }
    return p


def convert_vits(sd: Dict[str, np.ndarray], model) -> Dict[str, Any]:
    """reference jatts/models/vits.py state_dict -> flax variables."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    has_global = bool(getattr(model, "spk_embed_dim", None))

    te_p, te_bs = convert_conformer_encoder(
        sd, "text_encoder.encoder", model.text_encoder_blocks, has_embed=False,
        macaron=model.use_macaron_style_in_text_encoder,
        use_cnn=model.use_conformer_conv_in_text_encoder,
    )
    params["text_encoder"] = {
        "emb": t_embed(sd, "text_encoder.emb"),
        "encoder": te_p,
        "proj": t_conv1d(sd, "text_encoder.proj"),
    }
    if te_bs:
        batch_stats["text_encoder"] = {"encoder": te_bs}

    params["posterior_encoder"] = convert_posterior_encoder(
        sd, "posterior_encoder", model.posterior_encoder_layers, has_global
    )
    params["flow"] = convert_flow(
        sd, "flow", model.flow_flows, model.flow_layers, has_global
    )
    params["duration_predictor"] = _predictor_stack(
        sd, "duration_predictor", model.duration_predictor_layers
    )
    params["alignment_module"] = {
        k: t_conv1d(sd, f"alignment_module.{k}")
        for k in ("t_conv1", "t_conv2", "f_conv1", "f_conv2", "f_conv3")
    }
    dec_p, dec_bs = convert_conformer_encoder(
        sd, "decoder", model.dlayers, has_embed=False,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
    )
    params["decoder"] = dec_p
    if dec_bs:
        batch_stats["decoder"] = dec_bs
    params["feat_out"] = t_linear(sd, "feat_out")
    if has_global:
        params["projection"] = t_linear(sd, "projection")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def convert_valle(sd: Dict[str, np.ndarray], model) -> Dict[str, Any]:
    """reference jatts/models/valle_{ar,nar}.py state_dict -> flax variables.

    Reference layout (valle_base.py:81-103, valle/modules.py:96-239):
    text_emb(Embedding) / proms_emb.weight / resps_emb.weight (MultiEmbedding
    raw [L, n_tokens, D] params) / sep / blocks.N.{attn,ffn} PrenormResiduals
    / classifier. AR blocks use LayerNorm, NAR blocks use AdaLN (level
    embedding, valle/modules.py:140-162). The attention blocks are wrapped in
    torch checkpoint_wrapper (modules.py:212) whose state_dict prefix is
    normalized away here for robustness across torch versions.
    """
    sd = {k.replace("_checkpoint_wrapped_module.", ""): v for k, v in sd.items()}
    params: Dict[str, Any] = {
        "text_emb": t_embed(sd, "text_emb"),
        "proms_emb": sd["proms_emb.weight"],
        "resps_emb": sd["resps_emb.weight"],
        "sep": sd["sep"],
        "classifier": t_linear(sd, "classifier"),
    }

    def norm_params(prefix):
        if f"{prefix}.emb.weight" in sd:  # AdaLN
            return {"emb": {"embedding": sd[f"{prefix}.emb.weight"]}}
        return t_norm(sd, prefix)

    for i in range(model.n_layers):
        bp = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm_attn": norm_params(f"{bp}.attn.norm"),
            "attn": {
                "to_qkv": {"kernel": sd[f"{bp}.attn.block.to_qkv.weight"].T},
                "to_out": t_linear(sd, f"{bp}.attn.block.to_out"),
            },
            "norm_ffn": norm_params(f"{bp}.ffn.norm"),
            "ffn_in": t_linear(sd, f"{bp}.ffn.block.0"),
            "ffn_out": t_linear(sd, f"{bp}.ffn.block.3"),
        }
    return {"params": params}


def _rms(sd, name):
    """x_transformers RMSNorm param is 'g'; accept 'gamma'/'weight' variants
    across library versions."""
    for suffix in ("g", "gamma", "weight"):
        if f"{name}.{suffix}" in sd:
            return {"weight": sd[f"{name}.{suffix}"]}
    raise KeyError(f"no RMSNorm weight under {name}")


def convert_e2tts(sd: Dict[str, np.ndarray], model) -> Dict[str, Any]:
    """reference jatts/models/e2tts.py (UNetT backbone) state_dict -> flax
    variables.

    Reference layout (e2tts/unett.py:116-189, e2tts/modules.py): the E2TTS
    wrapper holds one ``backbone`` UNetT with time_embed (SinusPosEmb + MLP),
    text_embed (filler-token Embedding), input_embed (proj +
    ConvPositionEmbedding), depth x [skip_proj?, attn_norm(RMSNorm),
    attn(to_q/k/v/to_out.0), ff_norm, ff(Sequential proj/out)], norm_out,
    proj_out. Skip projections exist only for the later-half layers
    (unett.py:174).
    """
    bb: Dict[str, Any] = {
        "time_embed": {
            "mlp1": t_linear(sd, "backbone.time_embed.time_mlp.0"),
            "mlp2": t_linear(sd, "backbone.time_embed.time_mlp.2"),
        },
        "text_embed": t_embed(sd, "backbone.text_embed.text_embed"),
        "input_proj": t_linear(sd, "backbone.input_embed.proj"),
        "conv_pos_embed": {
            "conv1": t_conv1d(sd, "backbone.input_embed.conv_pos_embed.conv1d.0"),
            "conv2": t_conv1d(sd, "backbone.input_embed.conv_pos_embed.conv1d.2"),
        },
        "norm_out": _rms(sd, "backbone.norm_out"),
        "proj_out": t_linear(sd, "backbone.proj_out"),
    }
    for i in range(model.depth):
        lp = f"backbone.layers.{i}"
        if f"{lp}.0.weight" in sd:  # later-half skip projection
            bb[f"skip_proj_{i}"] = {"kernel": sd[f"{lp}.0.weight"].T}
        bb[f"attn_norm_{i}"] = _rms(sd, f"{lp}.1")
        bb[f"attn_{i}"] = {
            "to_q": t_linear(sd, f"{lp}.2.to_q"),
            "to_k": t_linear(sd, f"{lp}.2.to_k"),
            "to_v": t_linear(sd, f"{lp}.2.to_v"),
            "to_out": t_linear(sd, f"{lp}.2.to_out.0"),
        }
        bb[f"ff_norm_{i}"] = _rms(sd, f"{lp}.3")
        bb[f"ff_{i}"] = {
            "proj_in": t_linear(sd, f"{lp}.4.ff.0.0"),
            "proj_out": t_linear(sd, f"{lp}.4.ff.2"),
        }
    return {"params": {"backbone": bb}}


def load_reference_e2tts_state(path: str, use_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference E2-TTS checkpoint's state_dict.

    Reference format (trainers/e2tts.py:155-210): full checkpoints carry
    ``model_state_dict`` + ``ema_model_state_dict`` + ``update``; EMA-only
    checkpoints carry just ``ema_model_state_dict`` with ``ema_model.``
    key prefixes and EMA bookkeeping keys (initted/update/step). Decode
    uses the EMA weights (bin/e2tts_decode.py:144-150).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if not use_ema and "update" not in ckpt:
        # EMA-only checkpoint: there are no raw model weights to honor
        # --no-ema with — fail loudly instead of silently importing EMA
        raise ValueError(
            f"{path} is an EMA-only reference checkpoint (no "
            "model_state_dict); cannot import raw weights with use_ema=False"
        )
    if use_ema or "update" not in ckpt:
        ema = ckpt["ema_model_state_dict"]
        sd = {
            k.replace("ema_model.", ""): v
            for k, v in ema.items()
            if k not in ("initted", "update", "step")
        }
    else:
        sd = ckpt["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pkl training checkpoint's model state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
