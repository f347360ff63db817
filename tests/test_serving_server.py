"""Micro-batching serving server: concurrent per-utterance requests group
into fixed-batch program invocations and every caller gets exactly the
single-request result (padding rows are inert; bundles crop per row)."""

import os
import threading

import numpy as np
import pytest


def _tiny_bundle(tmp_path, batch_size=4):
    import jax

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving import export_bundle, load_bundle
    from jatts_tpu.serving.export import build_infer_fn

    num_mels, max_frames = 8, 32
    config = {"model_type": "FastSpeech2", "num_mels": num_mels,
              "sampling_rate": 24000, "hop_size": 300}
    model = FastSpeech2(
        idim=8, odim=num_mels, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=0, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2,
        energy_predictor_chans=8, conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7,
    )
    variables = model.init(
        {"params": jax.random.key(0)}, np.ones((1, 5), np.int32),
        np.array([5]), max_frames, method=FastSpeech2.inference,
    )
    fn, weights = build_infer_fn(
        config, model, variables, np.zeros(num_mels, np.float32),
        np.ones(num_mels, np.float32), max_frames,
    )
    out = export_bundle(
        os.path.join(str(tmp_path), "serving.npz"), fn, batch_size, [16],
        {"output": "mel"}, platforms=["cpu"], weights=weights,
    )
    return load_bundle(out)


def test_concurrent_requests_batch_and_match_solo(tmp_path):
    from jatts_tpu.serving.server import BatchingServer

    bundle = _tiny_bundle(tmp_path, batch_size=4)
    rng = np.random.default_rng(0)
    texts = [list(rng.integers(2, 7, rng.integers(3, 12))) for _ in range(10)]
    solo = {i: bundle.synthesize([t], seed=0)[0] for i, t in enumerate(texts)}

    with BatchingServer(bundle, max_delay_ms=50) as server:
        futures = {}
        barrier = threading.Barrier(len(texts))

        def fire(i):
            barrier.wait()
            futures[i] = server.submit(token_ids=texts[i])

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, fut in futures.items():
            res = fut.result(timeout=120)
            np.testing.assert_allclose(
                res["mel"], solo[i]["mel"], atol=1e-5, rtol=1e-5
            )
        stats = dict(server.stats)

    # 10 requests into batch-4 programs: real grouping must have happened
    assert stats["requests"] == 10
    assert stats["batches"] <= 7  # pure one-by-one dispatch would be 10


def test_seed_isolation_and_submit_validation(tmp_path):
    from jatts_tpu.serving.server import BatchingServer

    bundle = _tiny_bundle(tmp_path, batch_size=2)
    text = [2, 3, 4, 5]

    with BatchingServer(bundle, max_delay_ms=5) as server:
        # different seeds cannot share a program call, results still correct
        a = server.submit(token_ids=text, seed=1)
        b = server.submit(token_ids=text, seed=2)
        ra, rb = a.result(timeout=120), b.result(timeout=120)
        np.testing.assert_allclose(
            ra["mel"], bundle.synthesize([text], seed=1)[0]["mel"],
            atol=1e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            rb["mel"], bundle.synthesize([text], seed=2)[0]["mel"],
            atol=1e-5, rtol=1e-5,
        )

        # over-long text fails at submit, not inside a shared batch
        with pytest.raises(ValueError, match="exceeds largest bucket"):
            server.submit(token_ids=list(range(2, 6)) * 10)
        with pytest.raises(TypeError, match="missing request fields"):
            server.submit()

    # closed server refuses new work
    with pytest.raises(RuntimeError, match="closed"):
        server.submit(token_ids=text)
