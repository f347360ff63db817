"""Data-layer unit tests: io round trips, samplers, collaters."""

import numpy as np

from jatts_tpu.data.batcher import (
    BatchSampler,
    DynamicBatchSampler,
    FastSpeech2Collater,
    VALLECollater,
    round_up,
)
from jatts_tpu.data.token_id_converter import TokenIDConverter
from jatts_tpu.utils.io import (
    read_audio,
    read_csv,
    read_hdf5,
    write_audio,
    write_csv,
    write_hdf5,
)


def test_csv_roundtrip(tmp_path):
    rows = [
        {"sample_id": "a", "spk": "s1", "phonemes": "a b c"},
        {"sample_id": "b", "spk": "s2", "phonemes": "d e"},
    ]
    p = str(tmp_path / "x.csv")
    write_csv(rows, p)
    got, fields = read_csv(p, dict_reader=True)
    assert got == rows
    assert fields == ["sample_id", "spk", "phonemes"]


def test_hdf5_roundtrip_and_overwrite(tmp_path):
    p = str(tmp_path / "x.h5")
    write_hdf5(p, "mel", np.ones((4, 3)))
    write_hdf5(p, "mel", np.zeros((2, 2)))  # overwrite semantics
    assert read_hdf5(p, "mel").shape == (2, 2)


def test_audio_roundtrip(tmp_path):
    p = str(tmp_path / "a.wav")
    wav = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.5
    write_audio(p, wav, 24000)
    got, sr = read_audio(p, 24000)
    assert sr == 24000
    np.testing.assert_allclose(got, wav, atol=1e-3)


def test_read_audio_crop_and_resample(tmp_path):
    p = str(tmp_path / "b.wav")
    wav = np.random.default_rng(0).normal(size=48000).astype(np.float32) * 0.1
    write_audio(p, wav, 48000)
    got, sr = read_audio(p, 24000, start=0.25, end=0.75)
    assert sr == 24000
    assert abs(len(got) - 12000) <= 2


def test_token_id_converter():
    conv = TokenIDConverter(["<blank>", "<unk>", "a", "b", "<sos/eos>"])
    assert conv.tokens2ids(["a", "b", "zzz"]) == [2, 3, 1]
    assert conv.ids2tokens([2, 3]) == ["a", "b"]
    assert conv.get_num_vocabulary_size() == 5


def test_batch_sampler_groups_by_length():
    lengths = [10, 100, 12, 95, 11, 98]
    s = BatchSampler(lengths, batch_size=3, shuffle=False)
    batches = list(s)
    # sorted by length: short batch then long batch
    assert sorted(len(b) for b in batches) == [3, 3]
    first = {lengths[i] for i in batches[0]}
    assert first == {10, 11, 12} or first == {95, 98, 100}


def test_dynamic_batch_sampler_frame_budget():
    lengths = [50, 60, 200, 40, 350, 30]
    s = DynamicBatchSampler(lengths, frames_threshold=300, shuffle=False)
    for batch in s:
        assert sum(lengths[i] for i in batch) <= 300
    # 350 dropped (over threshold)
    used = {i for b in s.batches for i in b}
    assert 4 not in used


def test_fastspeech2_collater_shapes():
    items = [
        {
            "utt_id": "u1",
            "x": np.arange(5),
            "mel": np.ones((40, 8), np.float32),
            "durations": np.array([8, 8, 8, 8, 8]),
            "pitch": np.ones((5, 1), np.float32),
            "energy": np.ones((5, 1), np.float32),
        },
        {
            "utt_id": "u2",
            "x": np.arange(3),
            "mel": np.ones((25, 8), np.float32),
            "durations": np.array([8, 8, 9]),
            "pitch": np.ones((3, 1), np.float32),
            "energy": np.ones((3, 1), np.float32),
        },
    ]
    c = FastSpeech2Collater(pad_text_multiple=4, pad_feats_multiple=16)
    b = c(items)
    assert b["xs"].shape == (2, 8)  # 5 -> 8
    assert b["ys"].shape == (2, 48, 8)  # 40 -> 48
    np.testing.assert_array_equal(b["ilens"], [5, 3])
    np.testing.assert_array_equal(b["olens"], [40, 25])
    assert b["ds"].shape == (2, 8)


def test_valle_collater_prompt_crop():
    rng = np.random.default_rng(0)
    items = [
        {
            "utt_id": "u1",
            "x": np.arange(4),
            "encodec": rng.integers(0, 100, (300, 8)),
        }
    ]
    c = VALLECollater(prompt_max_frame_length=64, pad_frames_multiple=16)
    b = c(items)
    assert b["proms"].shape[1] == 64
    assert b["resps"].shape == (1, round_up(300, 16), 8)
    assert b["prom_lens"][0] == 64


def test_dataloader_prefetch_matches_sync():
    """Background-prefetch DataLoader yields the same batches in the same
    order as the synchronous path, and worker exceptions propagate."""
    import numpy as np
    import pytest

    from jatts_tpu.data.batcher import BatchSampler, DataLoader

    data = [{"x": np.full((3,), i, np.int32)} for i in range(10)]
    lengths = [3] * 10

    def collate(items):
        return {"x": np.stack([it["x"] for it in items])}

    sync = list(DataLoader(data, BatchSampler(lengths, 4, shuffle=False), collate))
    pre = list(DataLoader(data, BatchSampler(lengths, 4, shuffle=False), collate,
                          prefetch=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a["x"], b["x"])

    class Boom(list):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Boom(), BatchSampler(lengths, 4, shuffle=False), collate,
                        prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_dataloader_prefetch_worker_exits_on_abandon():
    """Breaking out of a prefetching DataLoader mid-epoch must not leak the
    worker thread (it would block forever on the full queue, pinning
    prefetch+1 collated batches in memory)."""
    import gc
    import threading
    import time

    from jatts_tpu.data.batcher import BatchSampler, DataLoader

    data = list(range(64))
    lengths = [1] * len(data)
    collate = lambda items: items  # noqa: E731

    before = set(threading.enumerate())
    it = iter(DataLoader(data, BatchSampler(lengths, 4, shuffle=False),
                         collate, prefetch=1))
    next(it)  # worker running, queue full
    it.close()  # consumer abandons (same path as `break` + gc)
    del it
    gc.collect()
    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"
