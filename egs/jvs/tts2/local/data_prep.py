#!/usr/bin/env python3
"""JVS data preparation for tts2 (MAS recipes: phonemes only, no external
durations) — delegates to the shared JVS walker in
../../tts1/local/data_prep.py (reference egs/jvs/tts2/local/data_prep.py
walks the same corpus layout)."""

import os
import runpy
import sys

_shared = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "tts1", "local",
    "data_prep.py",
)
sys.argv[0] = _shared
runpy.run_path(_shared, run_name="__main__")
