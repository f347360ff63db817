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


def make_tiny_sheet(d: str) -> str:
    """Miniature SSL-MOS-style predictor as a LOCAL torch.hub directory
    (reference evaluate.py:251-260 loads unilight/sheet:v0.1.0 via torch.hub
    and calls ``predictor.predict(wav_path=...)``). The hubconf builds a
    real (tiny, deterministic) torch model that reads the wav, frames it,
    and regresses a score squashed into SHEET's [1, 5] MOS range — so the
    --sheet-source path exercises model load + audio IO + inference, not a
    constant stub."""
    hubconf = '''\
dependencies = ["torch", "numpy", "scipy"]

import numpy as np
import torch


class _TinyMOSNet(torch.nn.Module):
    """frame -> tanh proj -> mean-pooled linear head -> sigmoid to [1, 5]."""

    FRAME = 64

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.proj = torch.nn.Linear(self.FRAME, 16)
        self.head = torch.nn.Linear(16, 1)

    def forward(self, frames):  # [N, FRAME] float
        h = torch.tanh(self.proj(frames))
        return 1.0 + 4.0 * torch.sigmoid(self.head(h).mean())

    @torch.no_grad()
    def predict(self, wav_path=None):
        from scipy.io import wavfile

        _, wav = wavfile.read(wav_path)
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav[:, 0]
        peak = float(np.max(np.abs(wav))) or 1.0
        wav = wav / peak
        n = (len(wav) // self.FRAME) * self.FRAME
        frames = (
            torch.from_numpy(wav[:n].reshape(-1, self.FRAME))
            if n else torch.zeros(1, self.FRAME)
        )
        return float(self.forward(frames))


def default(**kwargs):
    return _TinyMOSNet().eval()
'''
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "hubconf.py"), "w") as f:
        f.write(hubconf)
    return d
