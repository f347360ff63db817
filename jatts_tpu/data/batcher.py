"""Bucketed static-shape batching.

TPU-native replacement for the reference's DataLoader + pad-to-batch-max
collaters (jatts/collaters/fastspeech2.py:11-107) and the E2-TTS
``DynamicBatchSampler`` (jatts/datasets/tts_dataset.py:215-299): batches are
padded up to *bucket boundaries* (rounded maxima) so XLA compiles a small,
fixed set of programs instead of one per batch shape.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np


def round_up(x: int, m: int) -> int:
    return int(math.ceil(max(x, 1) / m) * m)


class BatchSampler:
    """Sort-by-length, fixed batch size, seeded per-epoch shuffle of batch
    order (keeps shape buckets while still randomizing)."""

    def __init__(
        self,
        lengths: Sequence[int],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.lengths = list(lengths)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        order = np.argsort(np.asarray(self.lengths), kind="stable")
        self.batches: List[List[int]] = [
            list(order[i : i + batch_size]) for i in range(0, len(order), batch_size)
        ]
        if drop_last and self.batches and len(self.batches[-1]) < batch_size:
            self.batches.pop()
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[List[int]]:
        batches = list(self.batches)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(batches)
        return iter(batches)


class DynamicBatchSampler:
    """Frame-budget batching (reference tts_dataset.py:215-299): sort by
    length, greedily pack until ``frames_threshold`` frames or
    ``max_samples`` utts; sequences over the threshold are dropped."""

    def __init__(
        self,
        lengths: Sequence[int],
        frames_threshold: int,
        max_samples: int = 0,
        shuffle: bool = True,
        seed: int = 0,
    ):
        order = np.argsort(np.asarray(lengths), kind="stable")
        self.batches = []
        self.n_dropped = 0
        batch: List[int] = []
        frames = 0
        for idx in order:
            l = lengths[idx]
            if l > frames_threshold:
                # the reference drops these silently (tts_dataset.py:254-271);
                # we count and log so shrunk datasets are visible
                self.n_dropped += 1
                continue
            if frames + l > frames_threshold or (max_samples and len(batch) == max_samples):
                if batch:
                    self.batches.append(batch)
                batch, frames = [], 0
            batch.append(int(idx))
            frames += l
        if batch:
            self.batches.append(batch)
        if self.n_dropped:
            import logging

            logging.warning(
                f"DynamicBatchSampler: dropped {self.n_dropped}/{len(lengths)} "
                f"utterances over the {frames_threshold}-frame threshold"
            )
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[List[int]]:
        batches = list(self.batches)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(batches)
        return iter(batches)


def _pad_to(x: np.ndarray, t: int) -> np.ndarray:
    pad = [(0, t - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


class FastSpeech2Collater:
    """Pads a list of dataset items into one static-shape numpy batch
    (reference jatts/collaters/fastspeech2.py:11-107, bucket-rounded).

    Emits: xs [B,Tx], ilens, ys [B,Ty,D], olens, and — when present —
    durations [B,Tx], pitch/energy [B,Tx,1], spkembs [B,D].
    """

    def __init__(
        self,
        pad_text_multiple: int = 16,
        pad_feats_multiple: int = 64,
        out_feat_type: str = "mel",
    ):
        self.pad_text_multiple = pad_text_multiple
        self.pad_feats_multiple = pad_feats_multiple
        self.out_feat_type = out_feat_type

    def __call__(self, items: List[Dict[str, Any]]) -> Dict[str, Any]:
        xs = [it["x"] for it in items]
        ilens = np.asarray([len(x) for x in xs], np.int32)
        t_text = round_up(int(ilens.max()), self.pad_text_multiple)
        batch: Dict[str, Any] = {
            "utt_ids": [it.get("utt_id", "") for it in items],
            "xs": np.stack([_pad_to(x, t_text) for x in xs]).astype(np.int32),
            "ilens": ilens,
        }
        if self.out_feat_type in items[0]:
            ys = [it[self.out_feat_type] for it in items]
            olens = np.asarray([len(y) for y in ys], np.int32)
            t_feats = round_up(int(olens.max()), self.pad_feats_multiple)
            batch["ys"] = np.stack([_pad_to(y, t_feats) for y in ys]).astype(np.float32)
            batch["olens"] = olens
        if "durations" in items[0]:
            ds = [it["durations"] for it in items]
            batch["ds"] = np.stack([_pad_to(d, t_text) for d in ds]).astype(np.int32)
        if "pitch" in items[0]:
            batch["ps"] = np.stack(
                [_pad_to(it["pitch"], t_text) for it in items]
            ).astype(np.float32)
        if "energy" in items[0]:
            batch["es"] = np.stack(
                [_pad_to(it["energy"], t_text) for it in items]
            ).astype(np.float32)
        if "spkemb" in items[0]:
            batch["spembs"] = np.stack([it["spkemb"].reshape(-1) for it in items]).astype(
                np.float32
            )
        return batch


class VALLECollater:
    """VALL-E batches: padded arrays instead of the reference's lists of
    variable-length tensors (jatts/collaters/valle.py:12-48). Also crops the
    prompt to ``prompt_max_frame_length`` with a random offset here
    (reference does it inside the model, utils/prompt.py:3-24)."""

    def __init__(
        self,
        pad_text_multiple: int = 16,
        pad_frames_multiple: int = 32,
        prompt_max_frame_length: int = 225,
        seed: int = 0,
        out_feat_type: str = "encodec",
    ):
        self.pad_text_multiple = pad_text_multiple
        self.pad_frames_multiple = pad_frames_multiple
        self.prompt_max = prompt_max_frame_length
        self.rng = np.random.default_rng(seed)

    def _codes(self, x):
        x = np.asarray(x)
        if x.ndim == 2 and x.shape[0] == 8 and x.shape[1] != 8:
            x = x.T  # [8, T] -> [T, 8]
        return x.astype(np.int32)

    def __call__(self, items: List[Dict[str, Any]]) -> Dict[str, Any]:
        texts = [it["x"] for it in items]
        text_lens = np.asarray([len(t) for t in texts], np.int32)
        tx = round_up(int(text_lens.max()), self.pad_text_multiple)

        proms = []
        for it in items:
            p = self._codes(it.get("prompt_encodec", it["encodec"]))
            if len(p) > self.prompt_max:  # random crop (prepare_prompt mode 1)
                off = int(self.rng.integers(0, len(p) - self.prompt_max + 1))
                p = p[off : off + self.prompt_max]
            proms.append(p)
        prom_lens = np.asarray([len(p) for p in proms], np.int32)
        tp = round_up(int(prom_lens.max()), self.pad_frames_multiple)

        resps = [self._codes(it["encodec"]) for it in items]
        resp_lens = np.asarray([len(r) for r in resps], np.int32)
        tr = round_up(int(resp_lens.max()), self.pad_frames_multiple)

        def pad2(x, t):
            return np.pad(x, ((0, t - x.shape[0]), (0, 0)))

        return {
            "utt_ids": [it.get("utt_id", "") for it in items],
            "text": np.stack([_pad_to(t, tx) for t in texts]).astype(np.int32),
            "text_lens": text_lens,
            "proms": np.stack([pad2(p, tp) for p in proms]),
            "prom_lens": prom_lens,
            "resps": np.stack([pad2(r, tr) for r in resps]),
            "resp_lens": resp_lens,
        }


COLLATER_REGISTRY = {
    "FastSpeech2Collater": FastSpeech2Collater,
    "VALLECollater": VALLECollater,
}


class DataLoader:
    """Sampler + collater -> numpy batches, with optional background
    prefetch.

    ``prefetch > 0`` overlaps h5 reads + collation with device execution on
    a daemon thread (h5py/numpy release the GIL) — the analog of the
    reference's multiprocess DataLoader workers (tts_train.py num_workers)
    without pickling overhead. Exceptions in the worker propagate to the
    consumer.
    """

    def __init__(self, dataset, sampler, collater, prefetch: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.collater = collater
        self.prefetch = int(prefetch or 0)

    def __len__(self) -> int:
        return len(self.sampler)

    def _make(self, batch_idx):
        return self.collater([self.dataset[i] for i in batch_idx])

    def __iter__(self):
        if self.prefetch <= 0:
            for batch_idx in self.sampler:
                yield self._make(batch_idx)
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that aborts when the consumer abandoned the
            # iterator (break / exception mid-epoch): a plain q.put would
            # block forever on the full queue, leaking the thread and
            # pinning prefetch+1 collated batches in memory
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch_idx in self.sampler:
                    if not _put(self._make(batch_idx)):
                        return
                _put(_END)
            except BaseException as e:  # noqa: BLE001 — propagate to consumer
                _put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            t.join()
        finally:
            # runs on GeneratorExit too (consumer break / gc of the iterator)
            stop.set()
