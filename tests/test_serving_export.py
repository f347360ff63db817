"""AOT serving export: jax.export bundles round-trip (export CLI -> load ->
synthesize) and match the in-process jit path exactly; bucket selection,
spkemb inputs, and seed-dependent sampling all covered."""

import os
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import write_hdf5


def _run(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def _write_stats(path, num_mels):
    rng = np.random.default_rng(7)
    mean = rng.normal(size=(num_mels,)).astype(np.float32)
    scale = (rng.uniform(0.5, 2.0, size=(num_mels,))).astype(np.float32)
    write_hdf5(path, "mel_mean", mean)
    write_hdf5(path, "mel_scale", scale)
    return mean, scale


def _write_tokens(path, n=8):
    with open(path, "w") as f:
        f.write("<blank>\n<unk>\n")
        for i in range(n - 3):
            f.write(f"p{i}\n")
        f.write("<sos/eos>\n")
    return n


def _save_ckpt(expdir, model, init_args, init_rngs):
    import jax

    from jatts_tpu.utils.checkpoint import save_checkpoint

    variables = model.init(init_rngs, *init_args, method=type(model).inference)
    save_checkpoint(expdir, 1, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "steps": 1, "epochs": 0,
    })
    return variables


def test_fs2_spkemb_bundle_matches_jit(tmp_path):
    import jax

    from jatts_tpu.bin.export_serving import main as export_main
    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving import load_bundle

    root = str(tmp_path)
    num_mels, spk_dim, max_frames = 12, 8, 96
    config = {
        "sampling_rate": 24000, "hop_size": 300, "fft_size": 512,
        "num_mels": num_mels,
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": num_mels, "adim": 16, "aheads": 2, "elayers": 1,
            "eunits": 32, "dlayers": 1, "dunits": 32, "postnet_layers": 0,
            "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
            "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
            "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
            "spk_embed_dim": spk_dim, "spk_embed_integration_type": "add",
        },
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.dump(config, f)
    stats = os.path.join(root, "stats.h5")
    mean, scale = _write_stats(stats, num_mels)
    tokens = os.path.join(root, "tokens.txt")
    n_vocab = _write_tokens(tokens)

    model = FastSpeech2(**dict(config["model_params"], idim=n_vocab))
    xs0 = np.ones((1, 5), np.int32)
    expdir = os.path.join(root, "exp")
    variables = _save_ckpt(
        expdir, model,
        (xs0, np.array([5]), max_frames, np.zeros((1, spk_dim), np.float32)),
        {"params": jax.random.key(0)},
    )

    out = os.path.join(root, "serving.npz")
    _run(export_main, [
        "export", "--config", conf, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--out", out, "--batch-size", "2",
        "--text-buckets", "16,32", "--max-frames", str(max_frames),
        "--platforms", "cpu",
    ])
    assert os.path.exists(out)

    bundle = load_bundle(out)
    assert bundle.buckets == [16, 32] and bundle.spk_dim == spk_dim

    rng = np.random.default_rng(0)
    ids = [list(rng.integers(2, n_vocab - 1, 20)),
           list(rng.integers(2, n_vocab - 1, 9))]
    spembs = rng.normal(size=(2, spk_dim)).astype(np.float32)
    res = bundle.synthesize(ids, seed=3, spembs=spembs)
    assert len(res) == 2
    for r in res:
        assert r["mel"].shape[1] == num_mels and np.isfinite(r["mel"]).all()
        assert "wav" not in r  # no vocoder baked in

    # exact agreement with the in-process jit path on the same bucket (32:
    # the longest text is 20)
    xs = np.zeros((2, 32), np.int32)
    for i, t in enumerate(ids):
        xs[i, : len(t)] = t
    ilens = np.array([len(t) for t in ids], np.int32)
    ref = model.apply(
        variables, xs, ilens, max_frames, spembs,
        method=FastSpeech2.inference,
        rngs={"noise": jax.random.PRNGKey(np.uint32(3))},
    )
    mel_ref = np.asarray(ref["feat_gen"]).astype(np.float32) * scale + mean
    olens_ref = np.asarray(ref["olens"])
    for i in range(2):
        assert res[i]["mel"].shape[0] == olens_ref[i]
        np.testing.assert_allclose(
            res[i]["mel"], mel_ref[i, : olens_ref[i]], atol=1e-5, rtol=1e-5
        )

    # over-long text is a clear error, not a silent crop
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        bundle.synthesize([list(range(2, 4)) * 20])


def test_matcha_bundle_seed_and_vocoder(tmp_path):
    import jax

    from jatts_tpu.bin.export_serving import main as export_main
    from jatts_tpu.models.matchatts import MatchaTTS
    from jatts_tpu.serving import load_bundle

    root = str(tmp_path)
    num_mels, max_frames = 12, 64
    config = {
        "sampling_rate": 24000, "hop_size": 300, "fft_size": 512,
        "num_mels": num_mels,
        "model_type": "MatchaTTS",
        "model_params": {
            "odim": num_mels, "adim": 16, "aheads": 2, "elayers": 1,
            "eunits": 32, "duration_predictor_chans": 8,
            "decoder_channels": [16, 16], "decoder_attention_head_dim": 8,
            "conformer_enc_kernel_size": 7,
        },
        "ode_steps": 2, "temperature": 0.667,
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.dump(config, f)
    stats = os.path.join(root, "stats.h5")
    _write_stats(stats, num_mels)
    tokens = os.path.join(root, "tokens.txt")
    n_vocab = _write_tokens(tokens)

    model = MatchaTTS(**dict(config["model_params"], idim=n_vocab))
    xs0 = np.ones((1, 5), np.int32)
    expdir = os.path.join(root, "exp")
    _save_ckpt(
        expdir, model, (xs0, np.array([5]), max_frames),
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
    )

    out = os.path.join(root, "serving.npz")
    _run(export_main, [
        "export", "--config", conf, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--out", out, "--batch-size", "2",
        "--text-buckets", "16", "--max-frames", str(max_frames),
        "--platforms", "cpu",
    ])
    bundle = load_bundle(out)

    ids = [[2, 3, 4, 5], [3, 4, 5]]
    a = bundle.synthesize(ids, seed=1)
    b = bundle.synthesize(ids, seed=1)
    c = bundle.synthesize(ids, seed=2)
    # deterministic given the seed; seed actually reaches the ODE noise
    np.testing.assert_array_equal(a[0]["mel"], b[0]["mel"])
    assert np.abs(a[0]["mel"] - c[0]["mel"]).max() > 1e-6


def test_valle_bundle_two_stage(tmp_path):
    """VALL-E export: fused AR+NAR program round-trips through the CLI and
    matches the in-process jitted fused fn exactly (same seed, same
    shapes)."""
    import jax
    import jax.numpy as jnp

    from jatts_tpu.bin.export_serving import main as export_main
    from jatts_tpu.models.valle import VALLEAR, VALLENAR
    from jatts_tpu.serving import build_valle_fn, load_bundle
    from jatts_tpu.utils.checkpoint import save_checkpoint

    root = str(tmp_path)
    tokens = os.path.join(root, "tokens.txt")
    n_vocab = _write_tokens(tokens)
    mp = {"n_tokens": 32, "d_model": 16, "n_heads": 2, "n_layers": 2,
          "n_prom_levels": 8, "n_resp_levels": 7,
          "prompt_max_frame_length": 12}
    max_steps = 8

    rng = np.random.default_rng(0)
    exps = {}
    for name, cls in (("ar", VALLEAR), ("nar", VALLENAR)):
        conf = os.path.join(root, f"{name}.yaml")
        with open(conf, "w") as f:
            yaml.dump({"model_type": cls.__name__, "model_params": mp}, f)
        model = cls(**dict(mp, idim=n_vocab))
        b, tx, tp, tr = 1, 4, 3, 2
        resps = (np.zeros((b, tr), np.int32) if cls is VALLEAR
                 else np.zeros((b, tr, 8), np.int32))
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1),
             "noise": jax.random.key(2)},
            np.ones((b, tx), np.int32), np.full((b,), tx, np.int32),
            np.zeros((b, tp, 8), np.int32), np.full((b,), tp, np.int32),
            resps, np.full((b,), tr, np.int32), deterministic=True,
        )
        expdir = os.path.join(root, f"exp_{name}")
        save_checkpoint(expdir, 1, {
            "params": jax.device_get(variables["params"]),
            "batch_stats": {}, "steps": 1, "epochs": 0,
        })
        exps[name] = (conf, expdir)

    out = os.path.join(root, "valle_serving.npz")
    _run(export_main, [
        "export", "--token-list", tokens,
        "--ar-config", exps["ar"][0], "--ar-expdir", exps["ar"][1],
        "--nar-config", exps["nar"][0], "--nar-expdir", exps["nar"][1],
        "--out", out, "--batch-size", "2", "--text-buckets", "8",
        "--max-steps", str(max_steps), "--platforms", "cpu",
    ])
    bundle = load_bundle(out)
    assert bundle.prompt_frames == 12 and bundle.n_prom_levels == 8

    ids = [list(rng.integers(2, n_vocab - 1, 5)),
           list(rng.integers(2, n_vocab - 1, 3))]
    proms = [rng.integers(0, 32, (6, 8)), rng.integers(0, 32, (4, 8))]
    res = bundle.synthesize(ids, proms, seed=7)
    assert len(res) == 2
    for r in res:
        assert r.ndim == 2 and r.shape[1] == 8
        assert (r >= 0).all() and (r <= 32).all()  # level0 may hold stop=32

    # exact agreement with the in-process fused fn (bf16 params like the CLI)
    def reload(name, cls):
        from jatts_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            restore_checkpoint,
        )

        model = cls(**dict(mp, idim=n_vocab, dtype=jnp.bfloat16))
        restored = restore_checkpoint(find_latest_checkpoint(exps[name][1]))
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == np.float32 else x,
            restored["params"],
        )
        return model, {"params": params}

    ar_model, ar_vars = reload("ar", VALLEAR)
    nar_model, nar_vars = reload("nar", VALLENAR)
    fused, weights = build_valle_fn(ar_model, ar_vars, nar_model, nar_vars,
                                    max_steps)
    fn = jax.jit(lambda *a: fused(weights, *a))
    xs = np.zeros((2, 8), np.int32)
    ilens = np.array([5, 3], np.int32)
    for i, t in enumerate(ids):
        xs[i, : len(t)] = t
    pr = np.zeros((2, 12, 8), np.int32)
    plens = np.array([6, 4], np.int32)
    for i, p in enumerate(proms):
        pr[i, : len(p)] = p
    ref = fn(xs, ilens, pr, plens, np.uint32(7))
    lens = np.asarray(ref["resp_lens"])
    for i in range(2):
        np.testing.assert_array_equal(
            res[i], np.asarray(ref["codes"])[i, : lens[i]]
        )


def test_e2tts_bundle_prompt_conditioned(tmp_path):
    """E2-TTS export: raw-mel prompt in, generated slice out; EMA weights
    preferred; exact agreement with the in-process jitted fn."""
    import jax

    from jatts_tpu.bin.export_serving import main as export_main
    from jatts_tpu.models.e2tts import E2TTS
    from jatts_tpu.serving import load_bundle
    from jatts_tpu.serving.export import build_e2tts_fn
    from jatts_tpu.utils.checkpoint import save_checkpoint

    root = str(tmp_path)
    num_mels, max_frames = 10, 48
    config = {
        "sampling_rate": 24000, "hop_size": 300, "num_mels": num_mels,
        "model_type": "E2TTS",
        "model_params": {
            "odim": num_mels, "backbone": "UNetT", "dim": 32, "depth": 2,
            "heads": 2, "ff_mult": 2, "pe_attn_head": 1,
        },
        "nfe_step": 2, "cfg_strength": 1.0, "sway_sampling_coef": -1.0,
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.dump(config, f)
    stats = os.path.join(root, "stats.h5")
    mean, scale = _write_stats(stats, num_mels)
    tokens = os.path.join(root, "tokens.txt")
    n_vocab = _write_tokens(tokens)

    model = E2TTS(**dict(config["model_params"], idim=n_vocab))
    cond0 = np.zeros((1, max_frames, num_mels), np.float32)
    text0 = np.zeros((1, 6), np.int32)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        cond0, text0, np.array([4]), np.array([8]), 2, 1.0, None,
        method=E2TTS.inference,
    )
    # EMA copy distinct from raw params: export must pick EMA
    ema = jax.tree_util.tree_map(lambda x: x * 0.5, variables["params"])
    expdir = os.path.join(root, "exp")
    save_checkpoint(expdir, 1, {
        "params": jax.device_get(variables["params"]),
        "ema_params": jax.device_get(ema),
        "batch_stats": {}, "steps": 1, "epochs": 0,
    })

    out = os.path.join(root, "serving.npz")
    _run(export_main, [
        "export", "--config", conf, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--out", out, "--batch-size", "2",
        "--text-buckets", "12", "--max-frames", str(max_frames),
        "--platforms", "cpu",
    ])
    bundle = load_bundle(out)
    assert bundle.max_frames == max_frames and bundle.num_mels == num_mels

    rng = np.random.default_rng(1)
    ids = [list(rng.integers(2, n_vocab - 1, 9)),
           list(rng.integers(2, n_vocab - 1, 5))]
    prompts = [rng.normal(size=(7, num_mels)).astype(np.float32),
               rng.normal(size=(5, num_mels)).astype(np.float32)]
    gen = [12, 9]
    res = bundle.synthesize(ids, prompts, gen, seed=4)
    assert [r.shape for r in res] == [(12, num_mels), (9, num_mels)]
    assert all(np.isfinite(r).all() for r in res)

    # exact agreement with the in-process jit path on EMA weights
    e2fn, weights = build_e2tts_fn(config, model, {"params": ema}, mean, scale)
    fn = jax.jit(lambda *a: e2fn(weights, *a))
    cond = np.zeros((2, max_frames, num_mels), np.float32)
    text = np.full((2, 12), -1, np.int32)
    ref_lens = np.array([7, 5], np.int32)
    duration = np.array([19, 14], np.int32)
    for i, (t, p) in enumerate(zip(ids, prompts)):
        text[i, : len(t)] = t
        cond[i, : len(p)] = p
    ref = fn(cond, text, ref_lens, duration, np.uint32(4))
    mel_ref = np.asarray(ref["mel"])
    for i in range(2):
        np.testing.assert_allclose(
            res[i], mel_ref[i, ref_lens[i]: duration[i]], atol=1e-5, rtol=1e-5
        )


def test_wav_baked_bundle(tmp_path):
    """Vocoder-baked export: the bundle outputs waveforms (text->wav as ONE
    exported program) with hop-scaled lengths."""
    import types

    import jax

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving import export_bundle, load_bundle
    from jatts_tpu.serving.export import build_infer_fn
    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

    num_mels, max_frames = 12, 48
    config = {"model_type": "FastSpeech2", "num_mels": num_mels,
              "sampling_rate": 24000}
    model = FastSpeech2(
        idim=8, odim=num_mels, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=0, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2,
        energy_predictor_chans=8, conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7,
    )
    xs0 = np.ones((1, 5), np.int32)
    variables = model.init(
        {"params": jax.random.key(0)}, xs0, np.array([5]), max_frames,
        method=FastSpeech2.inference,
    )
    gen = HiFiGANGenerator(
        in_channels=num_mels, channels=8, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    gen_vars = gen.init(jax.random.key(1), np.zeros((1, 8, num_mels), np.float32))
    voc = types.SimpleNamespace(
        model=gen, variables=gen_vars, mean=None, scale=None, hop_size=8
    )

    mean = np.zeros(num_mels, np.float32)
    scale = np.ones(num_mels, np.float32)
    # f32 artifact: float wav + mel, lengths consistent
    fn, weights = build_infer_fn(
        config, model, variables, mean, scale, max_frames, vocoder=voc,
        wav_format="f32",
    )
    out = export_bundle(
        os.path.join(str(tmp_path), "serving.npz"), fn, 1, [16],
        {"hop_size": 8, "output": "wav"}, platforms=["cpu"], weights=weights,
    )
    bundle = load_bundle(out)
    res = bundle.synthesize([[2, 3, 4]], seed=0)
    assert res[0]["wav"].shape == (res[0]["mel"].shape[0] * 8,)
    assert np.isfinite(res[0]["wav"]).all()

    # pcm16 artifact (the serving default): int16 wav only, sample-exact
    # vs the f32 path after quantization
    fn16, weights16 = build_infer_fn(
        config, model, variables, mean, scale, max_frames, vocoder=voc,
    )
    out16 = export_bundle(
        os.path.join(str(tmp_path), "serving16.npz"), fn16, 1, [16],
        {"hop_size": 8, "output": "wav", "wav_format": "pcm16"},
        platforms=["cpu"], weights=weights16,
    )
    res16 = load_bundle(out16).synthesize([[2, 3, 4]], seed=0)
    assert "mel" not in res16[0]
    assert res16[0]["wav"].dtype == np.int16
    expect = np.round(np.clip(res[0]["wav"], -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(res16[0]["wav"], expect)


def test_stream_export_cli(tmp_path):
    """--vocoder stream through the CLI: the exported bundle must actually
    carry the chunked-vocoder program (regression: _export_standard built
    the stream program but dropped it on the export_bundle call)."""
    import jax

    torch = pytest.importorskip("torch")
    from test_vocoder_hifigan import _build_torch_generator

    from jatts_tpu.bin.export_serving import main as export_main
    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving import load_bundle

    root = str(tmp_path)
    num_mels, max_frames = 12, 48

    # tiny torch HiFi-GAN checkpoint on disk, reference pickle layout
    gp = dict(
        in_channels=num_mels, channels=16, kernel_size=7,
        upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    torch.manual_seed(0)
    tg = _build_torch_generator(**gp).eval()
    voc_ckpt = os.path.join(root, "voc.pkl")
    torch.save({"model": {"generator": tg.state_dict()}}, voc_ckpt)
    voc_conf = os.path.join(root, "voc.yaml")
    def _untuple(v):
        return [_untuple(x) for x in v] if isinstance(v, (tuple, list)) else v

    with open(voc_conf, "w") as f:
        yaml.dump({"generator_params": {k: _untuple(v) for k, v in gp.items()},
                   "sampling_rate": 24000}, f)

    config = {
        "sampling_rate": 24000, "hop_size": 8, "fft_size": 512,
        "num_mels": num_mels,
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": num_mels, "adim": 16, "aheads": 2, "elayers": 1,
            "eunits": 32, "dlayers": 1, "dunits": 32, "postnet_layers": 0,
            "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
            "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
            "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
        },
        "vocoder": {"checkpoint": voc_ckpt, "config": voc_conf},
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.dump(config, f)
    stats = os.path.join(root, "stats.h5")
    _write_stats(stats, num_mels)
    tokens = os.path.join(root, "tokens.txt")
    n_vocab = _write_tokens(tokens)

    model = FastSpeech2(**dict(config["model_params"], idim=n_vocab))
    expdir = os.path.join(root, "exp")
    _save_ckpt(
        expdir, model,
        (np.ones((1, 5), np.int32), np.array([5]), max_frames),
        {"params": jax.random.key(0)},
    )

    out = os.path.join(root, "serving_stream.npz")
    _run(export_main, [
        "export", "--config", conf, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--out", out, "--batch-size", "2",
        "--text-buckets", "16", "--max-frames", str(max_frames),
        "--platforms", "cpu", "--vocoder", "stream", "--stream-chunk", "16",
    ])
    bundle = load_bundle(out)
    assert bundle.stream_fn is not None, "CLI dropped the stream program"
    assert bundle.meta["output"] == "mel"  # mel program stays vocoder-free
    assert bundle.meta["streaming"]["chunk"] == 16

    ids = [[2, 3, 4, 5], [3, 4]]
    chunks = [[] for _ in ids]
    for rows in bundle.synthesize_streaming(ids, seed=0):
        for i, r in enumerate(rows):
            chunks[i].append(r["wav"])
    mels = bundle.synthesize(ids, seed=0)
    hop = int(bundle.meta["streaming"]["hop"])
    for i in range(len(ids)):
        wav = np.concatenate(chunks[i])
        assert wav.dtype == np.int16
        assert wav.shape == (mels[i]["mel"].shape[0] * hop,)
