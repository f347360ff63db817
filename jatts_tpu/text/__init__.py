"""Japanese text frontend: G2P (pyopenjtalk-gated) + kana/phoneme utilities."""

from jatts_tpu.text.japanese import g2p_phonemes, kana_to_phonemes, text_to_kana
