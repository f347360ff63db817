"""Julius forced-alignment post-processing: unit tests + parity against the
reference's own calculate_frames (utils/data_prep_post_julius.py:23-80,
file-loaded with librosa stubbed to return a known-length waveform)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

from jatts_tpu.text.julius import (
    calculate_frames,
    cropped_n_samples,
    expected_total_frames,
    lab_to_row_updates,
    parse_lab,
    post_process_csv_rows,
)


def _load_reference_post_julius(n_samples: int):
    """Load the reference script with librosa.load stubbed to a fixed-length
    signal so calculate_frames' expected-total matches ours."""
    torch = pytest.importorskip("torch")  # noqa: F841 (image parity w/ other refs)
    from reference_loader import _CREATED_STUBS, _STUBBED_TOPS, _install_stubs

    _install_stubs()
    sys.modules["librosa"].load = lambda *a, **k: (np.zeros(n_samples), 24000)
    # script imports jatts.utils.utils (needs /root/reference on path)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_post_julius", "/root/reference/utils/data_prep_post_julius.py"
        )
        mod = importlib.util.module_from_spec(spec)
        # tqdm may be real; yaml real; soundfile stubbed by _install_stubs
        spec.loader.exec_module(mod)
        return mod
    finally:
        # confine stubs to the import window (same as load_reference's
        # finally): a leaked fake librosa with __spec__=None breaks any
        # later `import transformers` in this pytest process
        for mod_name in _CREATED_STUBS:
            sys.modules.pop(mod_name, None)
        _CREATED_STUBS.clear()
        _STUBBED_TOPS.clear()


def test_calculate_frames_reference_parity():
    rng = np.random.default_rng(0)
    hop, fs = 300, 24000
    for trial in range(20):
        n_ph = int(rng.integers(3, 12))
        # random phoneme intervals with non-integral frame durations
        durs = rng.uniform(0.03, 0.4, n_ph)
        starts = np.concatenate([[0.1], 0.1 + np.cumsum(durs)[:-1]])
        intervals = [
            (float(s), float(s + d), f"ph{i}")
            for i, (s, d) in enumerate(zip(starts, durs))
        ]
        crop_seconds = intervals[-1][1] - intervals[0][0]
        n_samples = int(round(crop_seconds * fs))

        ref = _load_reference_post_julius(n_samples)
        want = [
            f for *_rest, f in ref.calculate_frames("dummy.wav", intervals, hop, fs, 2048)
        ]
        got = calculate_frames(n_samples, intervals, hop, fs)
        assert got == want, f"trial {trial}: {got} != {want}"
        assert sum(got) == expected_total_frames(n_samples, hop)


def test_parse_lab_strips_sil_and_crops():
    lines = [
        "0.0000 0.3100 silB",
        "0.3100 0.4000 k",
        "0.4000 0.5500 o",
        "0.5500 0.7000 N",
        "0.7000 1.0000 silE",
    ]
    phonemes, intervals, start, end = parse_lab(lines)
    assert phonemes == ["k", "o", "N"]
    assert start == "0.3100" and end == "0.7000"
    assert intervals[0] == (0.31, 0.4, "k")


def test_lab_to_row_updates_and_post_process(tmp_path):
    lab = tmp_path / "utt1.lab"
    lab.write_text(
        "0.0 0.25 silB\n0.25 0.40 a\n0.40 0.62 r\n0.62 0.80 i\n0.80 1.0 silE\n"
    )
    fs, hop = 24000, 300
    n_samples = cropped_n_samples("0.25", "0.80", fs, fs)  # 0.55 s
    upd = lab_to_row_updates(str(lab), n_samples, hop, fs)
    assert upd["phonemes"] == "a r i"
    ds = [int(x) for x in upd["durations"].split()]
    assert sum(ds) == expected_total_frames(n_samples, hop)
    assert upd["start"] == "0.25" and upd["end"] == "0.80"

    # empty .lab (failed segmentation) -> dropped
    (tmp_path / "utt2.lab").write_text("")
    rows = [
        {"sample_id": "utt1", "wav_path": "x.wav", "phonemes": "old"},
        {"sample_id": "utt2", "wav_path": "y.wav", "phonemes": "old"},
        {"sample_id": "utt3", "wav_path": "z.wav", "phonemes": "old"},  # no lab
    ]
    out = post_process_csv_rows(
        rows, str(tmp_path), hop, fs, lambda row: n_samples
    )
    assert [r["sample_id"] for r in out] == ["utt1"]
    assert out[0]["phonemes"] == "a r i"
