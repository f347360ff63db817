"""Stage-5 evaluate CLI end-to-end (generated == reference -> MCD ~ 0)."""

import os
import sys

import numpy as np
import yaml

from jatts_tpu.utils.io import write_audio, write_csv


def test_evaluate_cli(tmp_path, capsys):
    root = str(tmp_path)
    sr = 24000
    os.makedirs(os.path.join(root, "ref"), exist_ok=True)
    os.makedirs(os.path.join(root, "gen"), exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    for i in range(2):
        t = np.arange(int(sr * 0.4)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (140 + 20 * i) * t)).astype(np.float32)
        ref = os.path.join(root, "ref", f"u{i}.wav")
        write_audio(ref, wav, sr)
        write_audio(os.path.join(root, "gen", f"u{i}.wav"), wav, sr)
        rows.append(
            {"sample_id": f"u{i}", "spk": "s", "wav_path": ref,
             "original_text": "x", "phonemes": "a"}
        )
    csv_path = os.path.join(root, "test.csv")
    write_csv(rows, csv_path)
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.dump({"sampling_rate": sr}, f)

    from jatts_tpu.bin.evaluate import main

    old = sys.argv
    sys.argv = ["ev", "--csv", csv_path, "--wavdir", os.path.join(root, "gen"),
                "--config", conf, "--n-jobs", "1",
                "--out", os.path.join(root, "results.csv")]
    try:
        main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "mean" in out
    assert os.path.exists(os.path.join(root, "results.csv"))
    import csv as _csv

    with open(os.path.join(root, "results.csv")) as f:
        res = list(_csv.DictReader(f))
    assert len(res) == 2
    assert all(float(r["mcd"]) < 0.01 for r in res)  # identical wavs


def test_edit_counts_and_normalization():
    """Reference-faithful ASR-eval pieces (jatts/bin/evaluate.py:35-112):
    alignment counts match hand-computed hits/subs/dels/ins, the pooled
    corpus-level error-rate formula, and the uppercase+punctuation-strip
    normalization (kana G2P is gated on pyopenjtalk)."""
    from jatts_tpu.bin.evaluate import edit_counts, levenshtein, normalize_sentence

    c = edit_counts("abcdef", "abzdefg")
    assert c == {"hits": 5, "substitutions": 1, "deletions": 0, "insertions": 1}
    # total edits always equals the plain Levenshtein distance
    for r, h in [("kitten", "sitting"), ("", "abc"), ("abc", ""), ("aa", "aa")]:
        cc = edit_counts(r, h)
        assert cc["substitutions"] + cc["deletions"] + cc["insertions"] == \
            levenshtein(r, h)
        assert cc["hits"] + cc["substitutions"] + cc["deletions"] == len(r)

    s = normalize_sentence("Hello, World!")
    assert "," not in s and "!" not in s
    assert s.startswith("HELLO")
    # Japanese punctuation (category P) stripped too
    assert "。" not in normalize_sentence("あ。")
