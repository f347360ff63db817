"""Streaming vocoder exactness: concatenated chunks == full-utterance vocode.

The claim in jatts_tpu/vocoder/streaming.py is structural — with context >=
the generator's receptive field, chunked vocoding is exact, and the first/last
windows' true-boundary alignment keeps the utterance edges exact too. Both
directions are pinned: the computed context matches to float tolerance, and a
too-small context measurably does NOT (so this test can actually fail)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatts_tpu.vocoder.hifigan import HiFiGANGenerator
from jatts_tpu.vocoder.streaming import (
    hop_size,
    min_context_frames,
    vocode_streaming,
    vocode_streaming_np,
)


@pytest.fixture(scope="module")
def small_voc():
    voc = HiFiGANGenerator(
        in_channels=8,
        channels=32,
        upsample_scales=(4, 3),
        upsample_kernel_sizes=(8, 6),
        resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3), (1, 3)),
    )
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))
    variables = voc.init(jax.random.key(0), mel)
    return voc, variables, mel


def test_chunks_match_full_utterance(small_voc):
    voc, variables, mel = small_voc
    full = np.asarray(voc.apply(variables, mel))
    assert full.shape == (2, 50 * hop_size(voc), 1)

    ctx = min_context_frames(voc)
    assert 0 < ctx < 50  # the analytic receptive field is meaningful

    for chunk in (16, 50, 64):  # interior windows / exactly-one / one-short
        chunks = list(vocode_streaming(voc, variables, mel, chunk=chunk))
        streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=0)
        assert len(chunks) == -(-50 // chunk)


def test_too_small_context_detectably_wrong(small_voc):
    voc, variables, mel = small_voc
    full = np.asarray(voc.apply(variables, mel))
    streamed = np.concatenate(
        list(vocode_streaming_np(voc, variables, mel, chunk=16, context=1)),
        axis=1,
    )
    assert np.abs(streamed - full).max() > 1e-4


def test_full_size_generator_context():
    # the shipped 24 kHz config: receptive field must stay a small fraction
    # of a typical utterance, or streaming buys nothing
    voc = HiFiGANGenerator()
    ctx = min_context_frames(voc)
    assert 8 <= ctx <= 40
    assert hop_size(voc) == 300
