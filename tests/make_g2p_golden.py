#!/usr/bin/env python3
"""Freeze pyopenjtalk G2P outputs as a golden file for text/japanese.py.

This zero-egress image has no pyopenjtalk (OpenJTalk C extension), so the
kana mora table's parity with the reference's G2P
(egs/jsut/tts2/local/data_prep.py:26-90) cannot be generated here. Run this
ON A MACHINE WITH pyopenjtalk to capture goldens; commit the json and
tests/test_text.py::test_g2p_golden_parity starts verifying automatically.

    python tests/make_g2p_golden.py            # writes tests/data/g2p_golden.json
"""

import json
import os
import sys

# katakana-transcript probes (the JSUT label style the mora table serves):
# plain morae, digraphs, sokuon, chouon, N, loanword smalls, punctuation
PROBES = [
    "コンニチワ",
    "アリガトーゴザイマス",
    "キャットガハシッタ",
    "シンブンシ",
    "ガッコーニイキマス",
    "チョットマッテクダサイ",
    "フィルムトウェブ",
    "ニッポンノジョセイ",
    "リョコーシャ、デンシャデ。",
]


def main():
    try:
        import pyopenjtalk
    except ImportError:
        sys.exit(
            "pyopenjtalk is not importable — run this on a machine that has "
            "it (goldens cannot be generated in the zero-egress image)"
        )
    golden = {
        "phonemes": {t: pyopenjtalk.g2p(t).split(" ") for t in PROBES},
        "kana": {t: pyopenjtalk.g2p(t, kana=True) for t in PROBES},
        "pyopenjtalk_version": getattr(pyopenjtalk, "__version__", "unknown"),
    }
    out = os.path.join(os.path.dirname(__file__), "data", "g2p_golden.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(golden, f, ensure_ascii=False, indent=1)
    print(f"golden written: {out}")


if __name__ == "__main__":
    main()
