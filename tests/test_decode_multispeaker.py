"""CLI-level multi-speaker decode: tts_decode must thread spkemb into
model.inference — it previously built only xs/ilens, so JVS-style recipes
decoded every utterance with NO speaker identity (silently)."""

import os
import sys

import numpy as np
import yaml

from jatts_tpu.utils.io import write_csv, write_hdf5


def _run(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def test_tts_decode_uses_spkemb(tmp_path):
    import jax

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.utils.checkpoint import save_checkpoint

    root = str(tmp_path)
    spk_dim = 8
    config = {
        "sampling_rate": 24000,
        "hop_size": 300,
        "fft_size": 512,
        "num_mels": 12,
        "feat_list": ["mel", "pitch", "energy", "spkemb"],
        "out_feat_type": "mel",
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": 12, "adim": 16, "aheads": 2, "elayers": 1, "eunits": 32,
            "dlayers": 1, "dunits": 32, "postnet_layers": 0,
            "duration_predictor_chans": 8, "pitch_predictor_chans": 8,
            "pitch_predictor_layers": 2, "energy_predictor_chans": 8,
            "conformer_enc_kernel_size": 7, "conformer_dec_kernel_size": 7,
            "spk_embed_dim": spk_dim, "spk_embed_integration_type": "add",
        },
    }
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(config, f)

    tokens = os.path.join(root, "tokens.txt")
    with open(tokens, "w") as f:
        f.write("<blank>\n<unk>\na\nb\nc\n<sos/eos>\n")

    # stats: identity normalization for every feat
    stats = os.path.join(root, "stats.h5")
    for feat, dim in (("mel", 12), ("pitch", 1), ("energy", 1),
                      ("spkemb", spk_dim)):
        write_hdf5(stats, f"{feat}_mean", np.zeros(dim, np.float32))
        write_hdf5(stats, f"{feat}_scale", np.ones(dim, np.float32))

    # two utterances: IDENTICAL phonemes, different speaker embeddings
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        h5 = os.path.join(root, f"utt{i}.h5")
        write_hdf5(h5, "spkemb", rng.normal(size=(spk_dim,)).astype(np.float32))
        rows.append({
            "sample_id": f"utt{i}", "spk": f"spk{i}", "wav_path": "",
            "original_text": "t", "phonemes": "a b c a b",
            "durations": "2 2 2 2 2", "feat_path": h5,
        })
    csv_path = os.path.join(root, "data.csv")
    write_csv(rows, csv_path)

    # random-init model checkpoint
    model_params = dict(config["model_params"], idim=6)
    model = FastSpeech2(**model_params)
    xs = np.ones((1, 5), np.int32)
    variables = model.init(
        {"params": jax.random.key(0)}, xs, np.array([5]), 64,
        np.zeros((1, spk_dim), np.float32), None,
        method=FastSpeech2.inference,
    )
    expdir = os.path.join(root, "exp")
    save_checkpoint(expdir, 1, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "steps": 1, "epochs": 0,
    })

    from jatts_tpu.bin.tts_decode import main as decode_main

    outdir = os.path.join(root, "decode")
    _run(decode_main, [
        "decode", "--csv", csv_path, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--config", conf_path, "--outdir", outdir,
        "--max-frames", "64", "--batch-size", "2",
    ])
    m0 = np.load(os.path.join(outdir, "wav", "utt0_mel.npy"))
    m1 = np.load(os.path.join(outdir, "wav", "utt1_mel.npy"))
    # same text, different speakers -> different mels; without spkemb
    # threading these were bit-identical
    assert m0.shape[0] > 0 and m1.shape[0] > 0
    t = min(len(m0), len(m1))
    assert np.abs(m0[:t] - m1[:t]).max() > 1e-6
