"""AOT serving export: a compiled, self-contained inference artifact.

The reference serves by running its Python model code per request
(jatts/bin/tts_decode.py:203-274 loops model.inference per utterance). The
TPU-native serving story is an ahead-of-time artifact instead: ``jax.export``
serializes the jitted text->mel(->wav) program — shapes fixed per
text-length bucket, platform-annotated StableHLO — which a serving process
deserializes and calls with NO model Python code on the path. Compilation
happens once at load (and the persistent XLA cache carries it across
restarts, see bin/tts_decode.py).

Weights travel as a RUNTIME ARGUMENT pytree stored once in the artifact —
NOT baked into the program as constants. Constant-baked weights made the
StableHLO itself ~100 MB+ per bucket (every bucket duplicating the full
f32 weight set), which (a) bloated artifacts and (b) exceeded remote-
compile request limits (HTTP 413 on this environment's relay — root-caused
round 4). The bundle device_puts the weights once at load and passes them
to every call. Old constant-baked artifacts still load (weights_as_args
absent from their meta).

Artifact layout (one ``.npz``):
    __meta__          json (batch size, buckets, output kind, rates, ...)
    t<bucket>         serialized jax.export bytes per text-length bucket
    w/<path>          weight leaves (flattened pytree; bf16 stored as
                      uint16 views, dtype map in meta["weight_dtypes"])

Inputs of every exported program (all fixed-shape):
    weights           the weight pytree (first argument)
    xs     int32  [B, T_bucket]   token ids, 0-padded
    ilens  int32  [B]             true text lengths
    seed   uint32 []              PRNG seed (ODE noise / VITS sampling; the
                                  program is deterministic given the seed)
    spembs float32 [B, spk_dim]   only when the model is multi-speaker
Outputs:
    mel    float32 [B, T_max, n_mels]  DEnormalized log-mel
    olens  int32   [B]                 valid output frames
    wav    float32 [B, T_max*hop]      only when a vocoder is baked in
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Sequence

import numpy as np


def _weights_entries(
    weights, prefix: str = "w"
) -> tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Flatten a weights pytree into npz-storable ``<prefix>/<path>`` arrays.

    bf16 (ml_dtypes) leaves don't survive np.savez dtype round trips —
    stored as uint16 views with their true dtype recorded in the returned
    dtype map."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(weights, sep="/")
    entries: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
            dtypes[k] = "bfloat16"
            arr = arr.view(np.uint16)
        entries[f"{prefix}/{k}"] = arr
    return entries, dtypes


def _weights_from_npz(
    z, meta, prefix: str = "w", dtype_key: str = "weight_dtypes"
) -> Optional[Dict[str, Any]]:
    if prefix == "w" and not meta.get("weights_as_args"):
        return None
    from flax import traverse_util

    dtypes = meta.get(dtype_key, {})
    flat = {}
    for key in z.files:
        if not key.startswith(prefix + "/"):
            continue
        path = key[len(prefix) + 1:]
        arr = z[key]
        if dtypes.get(path) == "bfloat16":
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        flat[path] = arr
    if not flat:
        return None
    return traverse_util.unflatten_dict(flat, sep="/")


def _weights_struct(weights):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "dtype") or not hasattr(x, "shape")
        else jax.ShapeDtypeStruct(x.shape, x.dtype),
        weights,
    )


def build_infer_fn(
    config: Dict[str, Any],
    model,
    variables,
    mel_mean: np.ndarray,
    mel_scale: np.ndarray,
    max_frames: int,
    vocoder=None,
    use_spembs: bool = False,
    wav_format: str = "pcm16",
):
    """Bind model + stats (+ optional Vocoder) into one pure
    ``fn(weights, xs, ilens, seed[, spembs]) -> dict`` plus its weights
    pytree (passed at call time, NOT closed over — closed-over arrays become
    HLO constants, see module docstring). Mirrors the per-family inference
    kwargs of bin/tts_decode.py.

    ``wav_format`` (vocoder artifacts only): "pcm16" quantizes the waveform
    to int16 IN-PROGRAM and drops the intermediate mel from the outputs —
    the serving payload per batch shrinks 5x (f32 wav + f32 mel -> int16
    wav + olens), which matters because device->host transfer is on the
    serving critical path. "f32" keeps the float waveform and the mel."""
    import jax
    import jax.numpy as jnp

    infer_kwargs = {}
    model_type = config["model_type"]
    if model_type.startswith("MatchaTTS"):
        infer_kwargs = dict(
            n_timesteps=int(config.get("ode_steps", 10)),
            temperature=float(config.get("temperature", 0.667)),
        )
    elif model_type == "VITS":
        infer_kwargs = dict(noise_scale=float(config.get("noise_scale", 0.667)))

    weights: Dict[str, Any] = {
        "model": variables,
        "mel_mean": jnp.asarray(mel_mean, jnp.float32),
        "mel_scale": jnp.asarray(mel_scale, jnp.float32),
    }
    voc_model = None
    if vocoder is not None:
        voc_model = vocoder.model
        weights["voc"] = vocoder.variables
        if vocoder.mean is not None:
            weights["voc_mean"] = jnp.asarray(vocoder.mean, jnp.float32)
            weights["voc_scale"] = jnp.asarray(vocoder.scale, jnp.float32)

    def fn(w, xs, ilens, seed, spembs=None):
        rng = jax.random.PRNGKey(seed)
        out = model.apply(
            w["model"], xs, ilens, max_frames, spembs,
            method=type(model).inference, rngs={"noise": rng}, **infer_kwargs,
        )
        mel_n = out["feat_gen"].astype(jnp.float32)
        # denorm by acoustic-model stats
        mel = mel_n * w["mel_scale"] + w["mel_mean"]
        res = {"olens": out["olens"].astype(jnp.int32)}
        if voc_model is None:
            res["mel"] = mel
            return res
        v = mel
        if "voc_mean" in w:
            v = (v - w["voc_mean"]) / w["voc_scale"]  # vocoder stats
        wav = voc_model.apply(w["voc"], v)[..., 0]
        if wav_format == "pcm16":
            res["wav"] = jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
        else:
            res["mel"] = mel
            res["wav"] = wav
        return res

    if use_spembs:
        return fn, weights
    return (lambda w, xs, ilens, seed: fn(w, xs, ilens, seed, None)), weights


def build_stream_step_fn(
    vocoder,
    max_frames: int,
    num_mels: int,
    chunk: int = 128,
    context: Optional[int] = None,
):
    """Streaming companion to a MEL bundle: one exported program that turns
    chunk ``k`` of the mel into pcm16 audio in a single dispatch.

    ``fn(vweights, mel, k) -> int16 [B, chunk*hop]`` where ``mel`` is the mel
    program's full [B, max_frames, num_mels] DEnormalized output (kept on
    device between calls) and ``k`` is the chunk index. The window extends
    ``context`` mel frames (default: the generator's receptive field,
    vocoder/streaming.py) past the chunk on each side, clamped to the true
    mel boundaries so edge chunks match the full-utterance program exactly —
    chunk concatenation is sample-identical to a wav-baked bundle's output.

    Why per-chunk dispatch instead of slicing host-side: each host round trip
    costs O(100 ms) through a dispatch tunnel; baking the dynamic window
    slice into the program makes a streamed utterance cost
    1 (mel) + n_chunks dispatches with the first audio on the host after
    just two.

    Returns ``(fn, vweights, stream_meta)`` for ``export_bundle(stream=...)``.
    """
    import jax
    import jax.numpy as jnp

    from jatts_tpu.vocoder.streaming import hop_size, min_context_frames

    voc_model = vocoder.model
    if context is None:
        context = min_context_frames(voc_model)
    hop = hop_size(voc_model)
    if max_frames % chunk:
        raise ValueError(f"max_frames {max_frames} not a multiple of chunk {chunk}")
    if chunk < context:
        raise ValueError(f"chunk {chunk} < vocoder receptive field {context}")
    window = min(max_frames, chunk + 2 * context)

    weights: Dict[str, Any] = {"voc": vocoder.variables}
    if vocoder.mean is not None:
        weights["voc_mean"] = jnp.asarray(vocoder.mean, jnp.float32)
        weights["voc_scale"] = jnp.asarray(vocoder.scale, jnp.float32)

    def fn(w, mel, k):
        v = mel
        if "voc_mean" in w:
            v = (v - w["voc_mean"]) / w["voc_scale"]
        s = (k * chunk).astype(jnp.int32)
        start = jnp.clip(s - context, 0, max_frames - window)
        win = jax.lax.dynamic_slice_in_dim(v, start, window, axis=1)
        wav = voc_model.apply(w["voc"], win)[..., 0]
        crop = jax.lax.dynamic_slice_in_dim(
            wav, (s - start) * hop, chunk * hop, axis=1
        )
        return jnp.round(jnp.clip(crop, -1.0, 1.0) * 32767.0).astype(jnp.int16)

    stream_meta = {
        "chunk": int(chunk),
        "context": int(context),
        "hop": int(hop),
        "max_frames": int(max_frames),
        "num_mels": int(num_mels),
    }
    return fn, weights, stream_meta


def build_e2tts_fn(
    config: Dict[str, Any],
    model,
    variables,
    mel_mean: np.ndarray,
    mel_scale: np.ndarray,
):
    """E2-TTS prompt-conditioned infill as one pure program:
    ``fn(cond_raw, text, ref_lens, duration, seed) -> {mel, olens}``.

    ``cond_raw`` is the RAW (denormalized) prompt log-mel, zero-padded to
    the fixed frame capacity — normalization by the training stats happens
    in-program, and the output mel is denormalized back, so the artifact is
    self-contained given a log-mel prompt. ``text`` uses -1 padding (the
    backbone's filler token), so text buckets pad safely.

    Returns ``(fn(weights, cond_raw, text, ref_lens, duration, seed),
    weights)`` — weights are call-time inputs, not baked constants."""
    import jax
    import jax.numpy as jnp

    steps = int(config.get("nfe_step", 32))
    cfg_strength = float(config.get("cfg_strength", 1.0))
    sway = config.get("sway_sampling_coef")
    weights = {
        "model": variables,
        "mel_mean": jnp.asarray(mel_mean, jnp.float32),
        "mel_scale": jnp.asarray(mel_scale, jnp.float32),
    }

    def fn(w, cond_raw, text, ref_lens, duration, seed):
        rng = jax.random.PRNGKey(seed)
        cond = (cond_raw.astype(jnp.float32) - w["mel_mean"]) / w["mel_scale"]
        out = model.apply(
            w["model"], cond, text, ref_lens, duration, steps, cfg_strength,
            sway, method=type(model).inference, rngs={"noise": rng},
        )
        mel = out["feat_gen"].astype(jnp.float32) * w["mel_scale"] + w["mel_mean"]
        return {"mel": mel, "olens": out["olens"].astype(jnp.int32)}

    return fn, weights


def export_e2tts_bundle(
    out_path: str,
    fn,
    batch_size: int,
    text_buckets: Sequence[int],
    max_frames: int,
    num_mels: int,
    meta: Dict[str, Any],
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights=None,
) -> str:
    import jax
    from jax import export as jexport

    entries: Dict[str, np.ndarray] = {}
    w_dtypes: Dict[str, str] = {}
    if weights is not None:
        w_entries, w_dtypes = _weights_entries(weights)
        entries.update(w_entries)
    for t in text_buckets:
        args = [
            jax.ShapeDtypeStruct((batch_size, max_frames, num_mels), np.float32),
            jax.ShapeDtypeStruct((batch_size, int(t)), np.int32),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
            jax.ShapeDtypeStruct((), np.uint32),
        ]
        if weights is not None:
            args = [_weights_struct(weights)] + args
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        entries[f"t{int(t)}"] = np.frombuffer(exp.serialize(), np.uint8)

    meta = dict(
        meta,
        output="mel",
        family="E2TTS",
        batch_size=int(batch_size),
        text_buckets=[int(t) for t in text_buckets],
        max_frames=int(max_frames),
        num_mels=int(num_mels),
        platforms=list(platforms),
        weights_as_args=weights is not None,
        weight_dtypes=w_dtypes,
    )
    entries["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8
    )
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    with open(out_path, "wb") as f:
        np.savez(f, **entries)
    return out_path


class E2ttsServingBundle:
    """Loaded E2-TTS artifact: raw prompt log-mel + token ids (prompt +
    separator + target, caller-composed like bin/e2tts_decode.py) ->
    generated mel slice per utterance."""

    def __init__(self, meta: Dict[str, Any], fns: Dict[int, Any], weights=None):
        self.meta = meta
        self.fns = fns
        self.batch_size = int(meta["batch_size"])
        self.buckets = sorted(int(t) for t in meta["text_buckets"])
        self.max_frames = int(meta["max_frames"])
        self.num_mels = int(meta["num_mels"])
        self.weights = _device_weights(weights)

    def synthesize(
        self,
        token_ids: Sequence[Sequence[int]],
        prompt_mels: Sequence[np.ndarray],  # raw log-mel [Tp_i, num_mels]
        gen_frames: Sequence[int],
        seed: int = 0,
    ):
        n = len(token_ids)
        if n > self.batch_size:
            raise ValueError(f"batch {n} > exported batch {self.batch_size}")
        longest = max(len(t) for t in token_ids)
        fit = [b for b in self.buckets if b >= longest]
        if not fit:
            raise ValueError(
                f"text length {longest} exceeds largest bucket {self.buckets[-1]}"
            )
        bucket = fit[0]
        text = np.full((self.batch_size, bucket), -1, np.int32)
        cond = np.zeros(
            (self.batch_size, self.max_frames, self.num_mels), np.float32
        )
        ref_lens = np.zeros((self.batch_size,), np.int32)
        duration = np.ones((self.batch_size,), np.int32)
        for i, (ids, pm, g) in enumerate(zip(token_ids, prompt_mels, gen_frames)):
            text[i, : len(ids)] = np.asarray(ids, np.int32)
            pm = np.asarray(pm, np.float32)
            # clamp the prompt so generation capacity remains (mirrors
            # bin/e2tts_decode.py)
            n_prompt = min(len(pm), max(self.max_frames - int(g), 0))
            cond[i, :n_prompt] = pm[:n_prompt]
            ref_lens[i] = n_prompt
            duration[i] = min(n_prompt + int(g), self.max_frames)
        args = [cond, text, ref_lens, duration, np.uint32(seed)]
        if self.weights is not None:
            args = [self.weights] + args
        out = self.fns[bucket].call(*args)
        mel = np.asarray(out["mel"])
        return [
            mel[i, ref_lens[i]: duration[i]] for i in range(n)
        ]


def build_e2tts_bundle_cli(
    out_path, config, model, variables, mel_mean, mel_scale,
    batch_size, text_buckets, max_frames, platforms,
):
    """CLI glue: build + export the E2-TTS artifact in one call."""
    fn, weights = build_e2tts_fn(config, model, variables, mel_mean, mel_scale)
    meta = {
        "model_type": "E2TTS",
        "sampling_rate": int(config.get("sampling_rate", 24000)),
        "hop_size": int(config.get("hop_size", 300)),
        "nfe_step": int(config.get("nfe_step", 32)),
    }
    return export_e2tts_bundle(
        out_path, fn, batch_size, text_buckets, max_frames,
        int(config.get("num_mels", 80)), meta, platforms, weights=weights,
    )


def build_valle_fn(
    ar_model, ar_vars, nar_model, nar_vars,
    max_steps: int,
    ar_temperature: float = 1.0,
    nar_temperature: float = 0.2,
):
    """Fuse the VALL-E two-stage decode into ONE pure program:
    ``fn(weights, text, text_lens, proms, prom_lens, seed) ->
    {codes, resp_lens}`` plus its ``weights = {"ar":..., "nar":...}``
    pytree (call-time inputs, not baked constants).

    The KV-cached AR scan and all 7 NAR level fills execute as a single
    compiled graph at fixed capacity (text bucket, prompt capacity,
    max_steps response) — level0 sanitization included (nar_generate).
    The neural codec decode (EnCodec, torch) stays outside the artifact."""
    import jax

    from jatts_tpu.models.valle import ar_generate, nar_generate

    weights = {"ar": ar_vars, "nar": nar_vars}

    def fn(w, text, text_lens, proms, prom_lens, seed):
        rng = jax.random.PRNGKey(seed)
        r_ar, r_nar = jax.random.split(rng)
        ar_out = ar_generate(
            ar_model, w["ar"], r_ar, text, text_lens, proms, prom_lens,
            max_steps=max_steps, sampling_temperature=ar_temperature,
        )
        codes = nar_generate(
            nar_model, w["nar"], r_nar, text, text_lens, proms, prom_lens,
            ar_out["codes"], ar_out["resp_lens"],
            sampling_temperature=nar_temperature,
        )
        return {"codes": codes, "resp_lens": ar_out["resp_lens"]}

    return fn, weights


def export_valle_bundle(
    out_path: str,
    fn,
    batch_size: int,
    text_buckets: Sequence[int],
    prompt_frames: int,
    n_prom_levels: int,
    meta: Dict[str, Any],
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights=None,
) -> str:
    """Export the fused VALL-E fn once per text-length bucket."""
    import jax
    from jax import export as jexport

    entries: Dict[str, np.ndarray] = {}
    w_dtypes: Dict[str, str] = {}
    if weights is not None:
        w_entries, w_dtypes = _weights_entries(weights)
        entries.update(w_entries)
    for t in text_buckets:
        args = [
            jax.ShapeDtypeStruct((batch_size, int(t)), np.int32),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
            jax.ShapeDtypeStruct(
                (batch_size, prompt_frames, n_prom_levels), np.int32
            ),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
            jax.ShapeDtypeStruct((), np.uint32),
        ]
        if weights is not None:
            args = [_weights_struct(weights)] + args
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        entries[f"t{int(t)}"] = np.frombuffer(exp.serialize(), np.uint8)

    meta = dict(
        meta,
        output="codes",
        batch_size=int(batch_size),
        text_buckets=[int(t) for t in text_buckets],
        prompt_frames=int(prompt_frames),
        n_prom_levels=int(n_prom_levels),
        platforms=list(platforms),
        weights_as_args=weights is not None,
        weight_dtypes=w_dtypes,
    )
    entries["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8
    )
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    with open(out_path, "wb") as f:
        np.savez(f, **entries)
    return out_path


class ValleServingBundle:
    """Loaded VALL-E artifact: text ids + prompt codes -> RVQ codes [T, L]."""

    def __init__(self, meta: Dict[str, Any], fns: Dict[int, Any], weights=None):
        self.meta = meta
        self.fns = fns
        self.batch_size = int(meta["batch_size"])
        self.buckets = sorted(int(t) for t in meta["text_buckets"])
        self.prompt_frames = int(meta["prompt_frames"])
        self.n_prom_levels = int(meta["n_prom_levels"])
        self.weights = _device_weights(weights)

    def synthesize(
        self,
        token_ids: Sequence[Sequence[int]],
        prompt_codes: Sequence[np.ndarray],  # per-utt [Tp_i, L]
        seed: int = 0,
    ):
        n = len(token_ids)
        if n > self.batch_size:
            raise ValueError(f"batch {n} > exported batch {self.batch_size}")
        longest = max(len(t) for t in token_ids)
        fit = [b for b in self.buckets if b >= longest]
        if not fit:
            raise ValueError(
                f"text length {longest} exceeds largest bucket {self.buckets[-1]}"
            )
        bucket = fit[0]
        xs = np.zeros((self.batch_size, bucket), np.int32)
        ilens = np.zeros((self.batch_size,), np.int32)
        proms = np.zeros(
            (self.batch_size, self.prompt_frames, self.n_prom_levels), np.int32
        )
        plens = np.zeros((self.batch_size,), np.int32)
        for i, (ids, pc) in enumerate(zip(token_ids, prompt_codes)):
            xs[i, : len(ids)] = np.asarray(ids, np.int32)
            ilens[i] = len(ids)
            pc = np.asarray(pc, np.int32)[: self.prompt_frames]
            proms[i, : len(pc)] = pc
            plens[i] = len(pc)
        args = [xs, ilens, proms, plens, np.uint32(seed)]
        if self.weights is not None:
            args = [self.weights] + args
        out = self.fns[bucket].call(*args)
        lens = np.asarray(out["resp_lens"])
        codes = np.asarray(out["codes"])  # ONE fetch, host-side row slicing
        return [codes[i, : lens[i]] for i in range(n)]


def _device_weights(weights):
    """Device-put the weights pytree once at bundle load: .call with host
    numpy weights would re-upload the full weight set on EVERY request."""
    if weights is None:
        return None
    import jax

    return jax.device_put(weights)


def load_bundle(path: str) -> "ServingBundle | ValleServingBundle":
    from jax import export as jexport

    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]))
    fns = {
        int(t): jexport.deserialize(bytes(z[f"t{int(t)}"]))
        for t in meta["text_buckets"]
    }
    weights = _weights_from_npz(z, meta)
    if meta.get("output") == "codes":
        return ValleServingBundle(meta, fns, weights)
    if meta.get("family") == "E2TTS":
        return E2ttsServingBundle(meta, fns, weights)
    stream = None
    if meta.get("streaming"):
        stream = (
            jexport.deserialize(bytes(z["stream_step"])),
            _weights_from_npz(z, meta, prefix="sw",
                              dtype_key="stream_weight_dtypes"),
        )
    return ServingBundle(meta, fns, weights, stream)


def export_bundle(
    out_path: str,
    fn,
    batch_size: int,
    text_buckets: Sequence[int],
    meta: Dict[str, Any],
    spk_dim: int = 0,
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights=None,
    stream=None,
) -> str:
    """Export ``fn`` once per text-length bucket and write the .npz bundle.

    ``platforms`` lowers a single artifact servable on any listed backend
    (jax.export multi-platform lowering needs no attached device).
    ``weights``: the pytree returned by build_infer_fn — stored ONCE in the
    artifact and passed as the program's first argument.
    ``stream``: optional ``(fn, vweights, stream_meta)`` from
    build_stream_step_fn — adds a chunked-vocoder program to a MEL bundle so
    the loaded bundle supports ``synthesize_streaming`` (low TTFA)."""
    import jax
    from jax import export as jexport

    entries: Dict[str, np.ndarray] = {}
    w_dtypes: Dict[str, str] = {}
    if weights is not None:
        w_entries, w_dtypes = _weights_entries(weights)
        entries.update(w_entries)
    stream_meta: Dict[str, Any] = {}
    sw_dtypes: Dict[str, str] = {}
    if stream is not None:
        s_fn, s_weights, stream_meta = stream
        sw_entries, sw_dtypes = _weights_entries(s_weights, prefix="sw")
        entries.update(sw_entries)
        s_args = [
            _weights_struct(s_weights),
            jax.ShapeDtypeStruct(
                (batch_size, stream_meta["max_frames"],
                 stream_meta["num_mels"]),
                np.float32,
            ),
            jax.ShapeDtypeStruct((), np.uint32),
        ]
        exp = jexport.export(jax.jit(s_fn), platforms=list(platforms))(*s_args)
        entries["stream_step"] = np.frombuffer(exp.serialize(), np.uint8)
    for t in text_buckets:
        args = [
            jax.ShapeDtypeStruct((batch_size, int(t)), np.int32),
            jax.ShapeDtypeStruct((batch_size,), np.int32),
            jax.ShapeDtypeStruct((), np.uint32),
        ]
        if spk_dim:
            args.append(jax.ShapeDtypeStruct((batch_size, spk_dim), np.float32))
        if weights is not None:
            args = [_weights_struct(weights)] + args
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        entries[f"t{int(t)}"] = np.frombuffer(exp.serialize(), np.uint8)

    meta = dict(
        meta,
        batch_size=int(batch_size),
        text_buckets=[int(t) for t in text_buckets],
        spk_dim=int(spk_dim),
        platforms=list(platforms),
        weights_as_args=weights is not None,
        weight_dtypes=w_dtypes,
        streaming=stream_meta or None,
        stream_weight_dtypes=sw_dtypes,
    )
    entries["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8
    )
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    with open(out_path, "wb") as f:
        np.savez(f, **entries)
    return out_path


class ServingBundle:
    """Loaded serving artifact: picks the smallest fitting bucket, pads,
    executes the deserialized program, crops by olens."""

    def __init__(self, meta: Dict[str, Any], fns: Dict[int, Any], weights=None,
                 stream=None):
        self.meta = meta
        self.fns = fns  # bucket -> deserialized Exported
        self.batch_size = int(meta["batch_size"])
        self.buckets = sorted(int(t) for t in meta["text_buckets"])
        self.spk_dim = int(meta.get("spk_dim", 0))
        self.weights = _device_weights(weights)
        self.stream_fn, self.stream_weights = (None, None)
        if stream is not None:
            self.stream_fn = stream[0]
            self.stream_weights = _device_weights(stream[1])

    def synthesize(
        self,
        token_ids: Sequence[Sequence[int]],
        seed: int = 0,
        spembs: Optional[np.ndarray] = None,
    ):
        """token_ids: <= batch_size sequences -> list of per-utterance dicts
        (mel [T_i, n_mels] cropped to olens; wav [T_i*hop] when present)."""
        args, bucket, n = self._prep_args(token_ids, seed, spembs)
        out = self.fns[bucket].call(*args)
        # fetch each output ONCE and slice on the host: np.asarray on a
        # per-row device slice is a separate device->host transfer, and the
        # fixed per-transfer latency (O(100 ms) through a dispatch tunnel)
        # times 2 outputs x batch rows dominated serving latency
        olens = np.asarray(out["olens"])
        hop = int(self.meta.get("hop_size", 0))
        mel = np.asarray(out["mel"]) if "mel" in out else None
        wav = np.asarray(out["wav"]) if "wav" in out else None
        results = []
        for i in range(n):
            r = {}
            if mel is not None:
                r["mel"] = mel[i, : olens[i]]
            if wav is not None:
                r["wav"] = wav[i, : olens[i] * hop]
            results.append(r)
        return results

    def _prep_args(self, token_ids, seed, spembs):
        n = len(token_ids)
        if n > self.batch_size:
            raise ValueError(f"batch {n} > exported batch {self.batch_size}")
        longest = max(len(t) for t in token_ids)
        fit = [b for b in self.buckets if b >= longest]
        if not fit:
            raise ValueError(
                f"text length {longest} exceeds largest bucket {self.buckets[-1]}"
            )
        bucket = fit[0]
        xs = np.zeros((self.batch_size, bucket), np.int32)
        ilens = np.zeros((self.batch_size,), np.int32)
        for i, ids in enumerate(token_ids):
            xs[i, : len(ids)] = np.asarray(ids, np.int32)
            ilens[i] = len(ids)
        args = [xs, ilens, np.uint32(seed)]
        if self.spk_dim:
            se = np.zeros((self.batch_size, self.spk_dim), np.float32)
            if spembs is not None:
                se[: len(spembs)] = np.asarray(spembs, np.float32)
            args.append(se)
        if self.weights is not None:
            args = [self.weights] + args
        return args, bucket, n

    def synthesize_streaming(self, token_ids, seed: int = 0,
                             spembs: Optional[np.ndarray] = None):
        """Chunked synthesis: yields audio left-to-right as it is computed.

        Requires a bundle exported with ``stream=`` (a mel bundle plus the
        chunked-vocoder program, build_stream_step_fn). The mel program runs
        once; its output STAYS ON DEVICE and each yielded item costs exactly
        one window dispatch + one host fetch — the first playable chunk
        arrives after two dispatches instead of after the full waveform.

        Yields, per chunk k, a list over the n requests of dicts:
            wav           int16 [<= chunk*hop], cropped to the row's true
                          remaining samples (empty once the row is finished)
            start_sample  absolute sample offset of this chunk
        Concatenating a row's chunks equals the wav a pcm16 wav-baked bundle
        of the same model+vocoder would return (pinned by
        tests/test_serving_streaming.py). Rows finish at different lengths;
        iteration stops after the longest row's last chunk."""
        if self.stream_fn is None:
            raise ValueError("bundle was exported without stream= support")
        st = self.meta["streaming"]
        chunk, hop = int(st["chunk"]), int(st["hop"])
        args, bucket, n = self._prep_args(token_ids, seed, spembs)
        out = self.fns[bucket].call(*args)
        if "mel" not in out:
            raise ValueError("streaming needs a mel bundle (no baked vocoder)")
        olens = np.asarray(out["olens"])  # host fetch; mel stays on device
        mel = out["mel"]
        n_chunks = max(1, -(-int(olens[:n].max()) // chunk))
        s_args = [mel, None]
        if self.stream_weights is not None:
            s_args = [self.stream_weights] + s_args
        for k in range(n_chunks):
            s_args[-1] = np.uint32(k)
            wav = np.asarray(self.stream_fn.call(*s_args))
            s = k * chunk
            results = []
            for i in range(n):
                hi = min(int(olens[i]), s + chunk) * hop
                results.append({
                    "wav": wav[i, : max(0, hi - s * hop)],
                    "start_sample": s * hop,
                })
            yield results
