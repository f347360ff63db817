"""Tiny randomly-initialized local HF models for exercising weight-gated
branches in a zero-egress image (no downloads — constructed + saved to tmp).
Used by tests/test_gated_branches.py and the ttslm recipe E2E."""

import json
import os


def make_tiny_encodec(d: str) -> str:
    """24 kHz EnCodec with the real model's code layout (8 quantizers at
    6 kbps, 1024-entry codebooks, 320x hop) but tiny channels."""
    import torch
    from transformers import EncodecConfig, EncodecModel

    cfg = EncodecConfig(
        target_bandwidths=[1.5, 3.0, 6.0], sampling_rate=24000,
        audio_channels=1, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2], codebook_size=1024, codebook_dim=16,
        hidden_size=16, num_lstm_layers=1,
    )
    torch.manual_seed(0)
    EncodecModel(cfg).eval().save_pretrained(d)
    return d


def make_tiny_asr(d: str) -> str:
    """Tiny wav2vec2 CTC pipeline dir (vocab + processor + model)."""
    import torch
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    vocab = {c: i for i, c in enumerate(
        ["<pad>", "<s>", "</s>", "<unk>", "|", "a", "b", "c"])}
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    tok = Wav2Vec2CTCTokenizer(os.path.join(d, "vocab.json"))
    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    proc = Wav2Vec2Processor(feature_extractor=fe, tokenizer=tok)
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, conv_dim=(8, 8),
        conv_stride=(5, 2), conv_kernel=(10, 3), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
    )
    torch.manual_seed(0)
    Wav2Vec2ForCTC(cfg).eval().save_pretrained(d)
    proc.save_pretrained(d)
    return d
