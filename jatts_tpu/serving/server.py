"""Micro-batching request server over an AOT serving bundle.

The exported programs (serving/export.py) run at a FIXED batch size — the
TPU-efficient shape — but serving traffic arrives one utterance at a time.
This dispatcher closes that gap the way production TPU serving stacks do:
requests queue, a background thread groups up to ``bundle.batch_size`` of
them inside a bounded latency window, one compiled program executes the
whole group, and every caller gets exactly the result it would have gotten
alone (the bundles crop per-row by true lengths, and rows are independent —
padding rows are semantically inert, pinned by tests/test_pad_batch.py and
tests/test_valle_padded_decode.py).

The reference has no serving layer at all (its decode is an offline batch
loop, jatts/bin/tts_decode.py:203-274); this is the TPU-native production
counterpart.

Usage:
    server = BatchingServer(load_bundle("serving.npz"), max_delay_ms=5)
    fut = server.submit(token_ids=[...])          # non-blocking -> Future
    mel = fut.result()["mel"]
    server.close()

Requests with different ``seed`` values cannot share a program invocation
(the seed is a scalar program input), so the batcher groups by seed; the
default seed=0 groups all traffic together.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from queue import Empty, Queue
from typing import Any, Dict, List, Optional

from jatts_tpu.serving.export import (
    E2ttsServingBundle,
    ServingBundle,
    ValleServingBundle,
)


class _Request:
    __slots__ = ("fields", "seed", "future", "chunks")

    def __init__(self, fields: Dict[str, Any], seed: int, stream: bool = False):
        self.fields = fields
        self.seed = int(seed)
        self.future: Future = Future()
        # streaming requests get a chunk queue instead of a single result
        self.chunks: Optional["Queue"] = Queue() if stream else None


class StreamHandle:
    """Iterator over one streamed utterance's audio chunks.

    Yields dicts ``{"wav": int16 [<=chunk*hop], "start_sample": int}`` in
    order as the dispatcher produces them; raises if the batch failed. The
    first chunk is available while later chunks are still computing."""

    def __init__(self, req: _Request):
        self._req = req

    def __iter__(self):
        while True:
            kind, payload = self._req.chunks.get()
            if kind == "err":
                raise payload
            if kind == "end":
                return
            if len(payload["wav"]):  # finished rows emit empty tails
                yield payload


class BatchingServer:
    """Groups per-utterance requests into fixed-batch program invocations.

    Dispatch rule: once the oldest queued request has waited ``max_delay_ms``
    (or a full batch is available, whichever is first), every compatible
    queued request — same seed, up to ``bundle.batch_size`` — executes as one
    program call. Under load the batch fills and the delay never triggers;
    at low rate a single request pays at most the delay window extra.
    """

    # per-bundle-kind required request fields, in bundle.synthesize order
    _FIELDS = {
        ServingBundle: ("token_ids",),
        ValleServingBundle: ("token_ids", "prompt_codes"),
        E2ttsServingBundle: ("token_ids", "prompt_mels", "gen_frames"),
    }

    def __init__(self, bundle, max_delay_ms: float = 5.0):
        self.bundle = bundle
        self.batch_size = int(bundle.batch_size)
        self.max_delay = float(max_delay_ms) / 1000.0
        self._required = self._FIELDS[type(bundle)]
        self._queue: "Queue[Optional[_Request]]" = Queue()
        self._pending: List[_Request] = []
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "rows": 0}
        self._thread = threading.Thread(
            target=self._loop, name="jatts-serving-batcher", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------- client API
    def submit(self, seed: int = 0, **fields) -> Future:
        """Enqueue one utterance; returns a Future.

        Required fields depend on the bundle family (token_ids always;
        prompt_codes for VALL-E; prompt_mels + gen_frames for E2-TTS;
        optional spemb for multi-speaker mel bundles)."""
        if self._closed:
            raise RuntimeError("server is closed")
        missing = [k for k in self._required if k not in fields]
        if missing:
            raise TypeError(f"missing request fields: {missing}")
        # fail fast at submit so a bad request cannot poison its batch-mates
        longest = self.bundle.buckets[-1]
        if len(fields["token_ids"]) > longest:
            raise ValueError(
                f"text length {len(fields['token_ids'])} exceeds largest "
                f"bucket {longest}"
            )
        req = _Request(fields, seed)
        self._queue.put(req)
        return req.future

    def submit_stream(self, seed: int = 0, **fields) -> StreamHandle:
        """Enqueue one utterance for CHUNKED synthesis; returns an iterator
        of audio chunks (see StreamHandle). Requires a mel bundle exported
        with stream= support (export.build_stream_step_fn). Streaming and
        non-streaming requests never share a program group.

        Known limitation: the chunk loop runs on the single dispatcher
        thread, so requests queued behind a stream wait for the whole
        utterance's chunks before their batch dispatches (head-of-line
        blocking). On one chip the DEVICE is busy with those chunk programs
        either way — interleaving dispatches would overlap only the O(ms)
        host-side fetch gaps — but latency-sensitive mixed traffic should
        use a separate BatchingServer instance for streams, or small
        ``chunk`` exports to shorten each hold."""
        if self._closed:
            raise RuntimeError("server is closed")
        if getattr(self.bundle, "stream_fn", None) is None:
            raise ValueError("bundle was exported without stream= support")
        missing = [k for k in self._required if k not in fields]
        if missing:
            raise TypeError(f"missing request fields: {missing}")
        longest = self.bundle.buckets[-1]
        if len(fields["token_ids"]) > longest:
            raise ValueError(
                f"text length {len(fields['token_ids'])} exceeds largest "
                f"bucket {longest}"
            )
        req = _Request(fields, seed, stream=True)
        self._queue.put(req)
        return StreamHandle(req)

    def synthesize(self, seed: int = 0, **fields):
        """Blocking convenience wrapper around submit()."""
        return self.submit(seed=seed, **fields).result()

    def close(self, timeout: Optional[float] = 10.0):
        """Drain the queue, stop the dispatcher thread."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------- dispatch loop
    def _loop(self):
        stop = False
        while not (stop and not self._pending and self._queue.empty()):
            # block for the first request, then hold the window open
            if not self._pending:
                item = self._queue.get()
                if item is None:
                    stop = True
                    continue
                self._pending.append(item)
            deadline = time.monotonic() + self.max_delay
            while len(self._pending) < self.batch_size:
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    item = self._queue.get(timeout=wait)
                except Empty:
                    break
                if item is None:
                    stop = True
                    break
                self._pending.append(item)
            # same-seed, same-mode group (the seed is a scalar program input;
            # streamed and non-streamed requests run different call paths)
            head = self._pending[0]
            seed, stream = head.seed, head.chunks is not None
            batch = [
                r for r in self._pending
                if r.seed == seed and (r.chunks is not None) == stream
            ][: self.batch_size]
            self._pending = [r for r in self._pending if r not in batch]
            if stream:
                self._dispatch_stream(batch, seed)
            else:
                self._dispatch(batch, seed)
        # report shutdown to anything still queued (submit raced close)
        while True:
            try:
                item = self._queue.get_nowait()
            except Empty:
                break
            if item is not None:
                item.future.set_exception(RuntimeError("server closed"))

    def _dispatch(self, batch: List[_Request], seed: int):
        self.stats["batches"] += 1
        self.stats["rows"] += self.batch_size
        self.stats["requests"] += len(batch)
        try:
            args = {
                k: [r.fields[k] for r in batch] for k in self._required
            }
            kwargs: Dict[str, Any] = {"seed": seed}
            if isinstance(self.bundle, ServingBundle) and any(
                "spemb" in r.fields for r in batch
            ):
                import numpy as np

                kwargs["spembs"] = np.stack(
                    [
                        np.asarray(r.fields["spemb"], np.float32)
                        if "spemb" in r.fields
                        else np.zeros((self.bundle.spk_dim,), np.float32)
                        for r in batch
                    ]
                )
            results = self.bundle.synthesize(*args.values(), **kwargs)
        except Exception as e:  # propagate to every caller in the group
            for r in batch:
                if not r.future.cancelled():
                    r.future.set_exception(e)
            return
        for r, res in zip(batch, results):
            if not r.future.cancelled():
                r.future.set_result(res)

    def _dispatch_stream(self, batch: List[_Request], seed: int):
        """One mel program + one window program per chunk; every request's
        queue receives its row of each chunk as soon as the chunk's fetch
        lands (so caller k can play chunk 0 while chunk 1 computes)."""
        self.stats["batches"] += 1
        self.stats["rows"] += self.batch_size
        self.stats["requests"] += len(batch)
        try:
            token_ids = [r.fields["token_ids"] for r in batch]
            kwargs: Dict[str, Any] = {"seed": seed}
            if any("spemb" in r.fields for r in batch):
                import numpy as np

                kwargs["spembs"] = np.stack(
                    [
                        np.asarray(r.fields["spemb"], np.float32)
                        if "spemb" in r.fields
                        else np.zeros((self.bundle.spk_dim,), np.float32)
                        for r in batch
                    ]
                )
            for rows in self.bundle.synthesize_streaming(token_ids, **kwargs):
                for r, row in zip(batch, rows):
                    r.chunks.put(("chunk", row))
        except Exception as e:  # propagate to every caller in the group
            for r in batch:
                r.chunks.put(("err", e))
            return
        for r in batch:
            r.chunks.put(("end", None))
