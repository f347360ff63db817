from jatts_tpu.text.japanese import _kata_to_hira, g2p_phonemes, kana_to_phonemes


def test_kana_basic():
    # literal kana reading (particle-wa disambiguation needs pyopenjtalk's
    # morphological analysis; the fallback is a pure mora table)
    assert kana_to_phonemes("こんにちは") == ["k", "o", "N", "n", "i", "ch", "i", "h", "a"]


def test_kana_digraphs_and_sokuon():
    assert kana_to_phonemes("きょう") == ["ky", "o", "u"]
    assert kana_to_phonemes("がっこう") == ["g", "a", "cl", "k", "o", "u"]


def test_chouon_lengthens_vowel():
    assert kana_to_phonemes("らーめん") == ["r", "a", "a", "m", "e", "N"]


def test_katakana_converted():
    assert _kata_to_hira("カタカナ") == "かたかな"
    assert kana_to_phonemes("カタカナ") == ["k", "a", "t", "a", "k", "a", "n", "a"]


def test_g2p_fallback_runs():
    phones = g2p_phonemes("こんにちは")
    assert len(phones) > 0


def test_g2p_golden_parity():
    """Verify the pure-python mora table against frozen pyopenjtalk outputs
    (tests/data/g2p_golden.json, produced by tests/make_g2p_golden.py on a
    machine with pyopenjtalk). Skips until a golden is committed — the
    zero-egress image cannot generate one (reference G2P:
    egs/jsut/tts2/local/data_prep.py:26-90)."""
    import json
    import os

    import pytest

    from jatts_tpu.text.japanese import kana_to_phonemes

    path = os.path.join(os.path.dirname(__file__), "data", "g2p_golden.json")
    if not os.path.exists(path):
        pytest.skip("no pyopenjtalk golden captured yet (see make_g2p_golden.py)")
    with open(path, encoding="utf-8") as f:
        golden = json.load(f)
    mismatches = {}
    for text, ref in golden["phonemes"].items():
        # compare on the segmental content the mora table models (pyopenjtalk
        # emits 'pau'/'sil' from punctuation too — keep them)
        ours = kana_to_phonemes(text)
        if ours != ref:
            mismatches[text] = (ours, ref)
    assert not mismatches, mismatches
