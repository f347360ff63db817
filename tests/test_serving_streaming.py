"""Streaming serving: chunked bundle output == wav-baked bundle output.

Exports the SAME tiny FS2 + HiFi-GAN pair twice — once as a pcm16 wav-baked
bundle (the non-streaming reference), once as a mel bundle + chunked-vocoder
program (export.build_stream_step_fn) — and pins that a request's
concatenated stream chunks are sample-identical to the wav-baked result, at
every row of a ragged batch. Then drives the same artifact through
BatchingServer.submit_stream (mixed with non-streaming submits)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bundles(tmp_path_factory):
    import types

    import jax

    from jatts_tpu.models.fastspeech2 import FastSpeech2
    from jatts_tpu.serving import export_bundle, load_bundle
    from jatts_tpu.serving.export import build_infer_fn, build_stream_step_fn
    from jatts_tpu.vocoder.hifigan import HiFiGANGenerator

    tmp_path = tmp_path_factory.mktemp("stream_bundles")
    num_mels, max_frames, batch = 12, 48, 2
    config = {"model_type": "FastSpeech2", "num_mels": num_mels,
              "sampling_rate": 24000}
    model = FastSpeech2(
        idim=8, odim=num_mels, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=0, duration_predictor_chans=8,
        pitch_predictor_chans=8, pitch_predictor_layers=2,
        energy_predictor_chans=8, conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7,
    )
    xs0 = np.ones((1, 5), np.int32)
    variables = model.init(
        {"params": jax.random.key(0)}, xs0, np.array([5]), max_frames,
        method=FastSpeech2.inference,
    )
    gen = HiFiGANGenerator(
        in_channels=num_mels, channels=8, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    gen_vars = gen.init(jax.random.key(1), np.zeros((1, 8, num_mels), np.float32))
    voc = types.SimpleNamespace(
        model=gen, variables=gen_vars, mean=None, scale=None, hop_size=8
    )
    mean = np.zeros(num_mels, np.float32)
    scale = np.ones(num_mels, np.float32)

    fn16, w16 = build_infer_fn(
        config, model, variables, mean, scale, max_frames, vocoder=voc
    )
    wav_path = export_bundle(
        os.path.join(str(tmp_path), "wav.npz"), fn16, batch, [16],
        {"hop_size": 8, "output": "wav", "wav_format": "pcm16"},
        platforms=["cpu"], weights=w16,
    )

    fn_mel, w_mel = build_infer_fn(
        config, model, variables, mean, scale, max_frames
    )
    stream = build_stream_step_fn(voc, max_frames, num_mels, chunk=16)
    mel_path = export_bundle(
        os.path.join(str(tmp_path), "mel_stream.npz"), fn_mel, batch, [16],
        {"output": "mel"}, platforms=["cpu"], weights=w_mel, stream=stream,
    )
    return load_bundle(wav_path), load_bundle(mel_path)


def test_stream_chunks_match_wav_bundle(bundles):
    wav_bundle, stream_bundle = bundles
    reqs = [[2, 3, 4], [5, 6, 7, 3, 2, 4, 6, 5]]  # ragged: different olens
    ref = wav_bundle.synthesize(reqs, seed=0)

    per_row = [[] for _ in reqs]
    starts = [[] for _ in reqs]
    for rows in stream_bundle.synthesize_streaming(reqs, seed=0):
        for i, row in enumerate(rows):
            per_row[i].append(row["wav"])
            starts[i].append(row["start_sample"])
    for i in range(len(reqs)):
        got = np.concatenate(per_row[i])
        assert got.dtype == np.int16
        # identical mel -> identical float wav -> identical pcm16, except
        # where XLA fusion rounding crosses a quantization boundary
        assert got.shape == ref[i]["wav"].shape
        np.testing.assert_allclose(got, ref[i]["wav"], atol=1)
        assert starts[i] == [k * 16 * 8 for k in range(len(starts[i]))]
    # ragged crop: the short row's chunks must sum to its own olen, not the
    # batch max
    assert sum(len(c) for c in per_row[0]) != sum(len(c) for c in per_row[1])


def test_stream_requires_stream_export(bundles):
    wav_bundle, stream_bundle = bundles
    with pytest.raises(ValueError, match="stream"):
        list(wav_bundle.synthesize_streaming([[2, 3]], seed=0))


def test_server_submit_stream(bundles):
    from jatts_tpu.serving.server import BatchingServer

    wav_bundle, stream_bundle = bundles
    ref = wav_bundle.synthesize([[2, 3, 4]], seed=0)[0]["wav"]
    with BatchingServer(stream_bundle, max_delay_ms=5) as server:
        handle = server.submit_stream(token_ids=[2, 3, 4])
        fut = server.submit(token_ids=[5, 6, 7])  # mixed traffic, same bundle
        chunks = [c["wav"] for c in handle]
        mel = fut.result()["mel"]
    np.testing.assert_allclose(np.concatenate(chunks), ref, atol=1)
    assert mel.ndim == 2 and np.isfinite(mel).all()

    with BatchingServer(wav_bundle) as server:
        with pytest.raises(ValueError, match="stream"):
            server.submit_stream(token_ids=[2, 3])
