"""Quality-evidence E2E: the full recipe pipeline LEARNS on a corpus where
spectra are a deterministic function of the phoneme sequence, measured on the
WORLD-comparable MCD scale (stage-5 metric, BASELINE.md Table 2 procedure).

True MCD parity with the tech report needs the JSUT corpus and trained
checkpoints, neither of which exists in this zero-egress image; this test
pins down everything that can be verified without them: training reduces
WORLD MCD far below the mismatched-utterance baseline, and the whole chain
(preprocess -> stats -> train -> tts_decode --vocoder griffin_lim ->
evaluate-style MCD) runs the real code paths end-to-end.
"""

import os
import sys

import numpy as np
import pytest
import yaml

from jatts_tpu.utils.io import read_csv, write_audio, write_csv

SR, HOP = 24000, 300
PHONES = ["a", "i", "u", "e", "o", "k", "s", "t"]


def _phoneme_wave(ph, n_samples, phase0=0.0):
    """Deterministic per-phoneme harmonic stack: f0 and harmonic amplitudes
    depend only on the phoneme identity, so text -> spectrum is learnable."""
    idx = PHONES.index(ph)
    f0 = 110.0 * 2.0 ** (idx / 8.0)
    t = np.arange(n_samples) / SR
    amps = [0.5, 0.3 * ((idx % 3) / 2.0 + 0.2), 0.15 * ((idx % 4) / 3.0 + 0.2)]
    wav = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t + phase0)
              for k, a in enumerate(amps))
    return wav.astype(np.float32)


def _make_corpus(root, n_train=16, n_test=3, seed=0):
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rng = np.random.default_rng(seed)
    all_rows = []
    for i in range(n_train + n_test):
        n_ph = int(rng.integers(4, 8))
        ph = list(rng.choice(PHONES, n_ph))
        durs = rng.integers(6, 14, n_ph)
        wav = np.concatenate(
            [_phoneme_wave(p, int(d) * HOP) for p, d in zip(ph, durs)]
        )
        path = os.path.join(root, "wav", f"utt{i}.wav")
        write_audio(path, wav, SR)
        all_rows.append({
            "sample_id": f"utt{i}", "spk": "spk1", "wav_path": path,
            "start": "", "end": "", "original_text": "dummy",
            "phonemes": " ".join(ph),
            "durations": " ".join(str(int(d)) for d in durs),
        })
    train_csv = os.path.join(root, "train.csv")
    test_csv = os.path.join(root, "test.csv")
    write_csv(all_rows[:n_train], train_csv)
    write_csv(all_rows[n_train:], test_csv)
    return train_csv, test_csv


def _run(module_main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_training_reduces_world_mcd(tmp_path):
    root = str(tmp_path)
    train_csv, test_csv = _make_corpus(root)

    config = {
        "sampling_rate": SR, "fft_size": 2048, "hop_size": HOP,
        "win_length": None, "num_mels": 40, "fmin": 80, "fmax": 7600,
        "feat_list": ["mel", "pitch", "energy"], "out_feat_type": "mel",
        "model_type": "FastSpeech2",
        "model_params": {
            "odim": 40, "adim": 32, "aheads": 2, "elayers": 1, "eunits": 64,
            "dlayers": 1, "dunits": 64, "postnet_layers": 2,
            "postnet_chans": 16, "duration_predictor_chans": 16,
            "pitch_predictor_chans": 16, "pitch_predictor_layers": 2,
            "energy_predictor_chans": 16, "conformer_enc_kernel_size": 7,
            "conformer_dec_kernel_size": 7,
        },
        "trainer_type": "FastSpeech2Trainer",
        "collater_type": "FastSpeech2Collater",
        "criterions": {
            "MelLoss": {"_type": "L1Loss"}, "DurationPredictorLoss": {},
            "PitchLoss": {}, "EnergyLoss": {},
        },
        "batch_size": 4, "optimizer_type": "Adam",
        "optimizer_params": {"lr": 0.002}, "grad_norm": 1.0,
        "scheduler": "warmuplr", "scheduler_params": {"warmup_steps": 50},
        "train_max_steps": 250, "save_interval_steps": 250,
        "eval_interval_steps": 0, "log_interval_steps": 100,
        "eval_max_frames": 128, "num_save_intermediate_results": 1,
        # exercise the K-steps-per-dispatch scan path in a real recipe run
        "steps_per_execution": 5,
    }
    conf_path = os.path.join(root, "conf.yaml")
    with open(conf_path, "w") as f:
        yaml.dump(config, f)

    from jatts_tpu.bin.compute_statistics import main as stats_main
    from jatts_tpu.bin.generate_token_list import main as tokens_main
    from jatts_tpu.bin.preprocess import main as preprocess_main
    from jatts_tpu.bin.tts_decode import main as decode_main
    from jatts_tpu.bin.tts_train import main as train_main

    dump = os.path.join(root, "dump")
    for csv in (train_csv, test_csv):
        _run(preprocess_main, [
            "preprocess", "--csv", csv, "--config", conf_path,
            "--dumpdir", dump, "--out-csv", csv,
        ])
    stats = os.path.join(root, "stats.h5")
    _run(stats_main, ["stats", "--csv", train_csv, "--config", conf_path,
                      "--out", stats])
    tokens = os.path.join(root, "tokens.txt")
    _run(tokens_main, ["tokens", "--csv", train_csv, "--out", tokens])

    expdir = os.path.join(root, "exp")
    _run(train_main, [
        "train", "--train-csv", train_csv, "--dev-csv", test_csv,
        "--stats", stats, "--token-list", tokens, "--config", conf_path,
        "--outdir", expdir,
    ])

    outdir = os.path.join(root, "decode")
    _run(decode_main, [
        "decode", "--csv", test_csv, "--stats", stats, "--token-list", tokens,
        "--expdir", expdir, "--config", os.path.join(expdir, "config.yml"),
        "--outdir", outdir, "--max-frames", "128", "--batch-size", "3",
        "--vocoder", "griffin_lim",
    ])

    from jatts_tpu.evaluate.dtw_based import calculate_mcd_f0
    from jatts_tpu.utils.io import read_audio

    rows, _ = read_csv(test_csv, dict_reader=True)
    gen_mcds, mismatch_mcds = [], []
    for k, row in enumerate(rows):
        gen_path = os.path.join(outdir, "wav", f"{row['sample_id']}.wav")
        assert os.path.exists(gen_path), "griffin_lim vocoder produced no wav"
        gen, _ = read_audio(gen_path, SR)
        ref, _ = read_audio(row["wav_path"], SR)
        gen_mcds.append(calculate_mcd_f0(gen, ref, SR)["mcd"])
        # mismatched baseline: the same generated wav scored against a
        # DIFFERENT utterance's reference
        other = rows[(k + 1) % len(rows)]
        ref_o, _ = read_audio(other["wav_path"], SR)
        mismatch_mcds.append(calculate_mcd_f0(gen, ref_o, SR)["mcd"])

    gen_mcd = float(np.nanmean(gen_mcds))
    mismatch_mcd = float(np.nanmean(mismatch_mcds))
    # the trained model must track ITS text's spectra: clearly better than
    # the same audio scored against mismatched text
    assert np.isfinite(gen_mcd) and gen_mcd > 0
    assert gen_mcd < mismatch_mcd - 0.5, (gen_mcd, mismatch_mcd)
