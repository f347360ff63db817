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
