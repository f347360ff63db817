"""Import the ACTUAL reference torch code at /root/reference for parity tests.

The round-1 parity tests compared against hand-written torch replicas
(tests/torch_replica.py) — a shared misunderstanding would pass. These
helpers import the reference's own modules (torch-cpu is in the image),
stubbing only third-party packages that are (a) absent from the image and
(b) needed merely at import/class-definition time, never on the code paths
we test:

- ``numba``: ``@jit`` becomes a no-op decorator, so the reference MAS
  Viterbi (jatts/modules/alignments.py:63-278) runs as pure python —
  bit-identical integer output, just slower.
- ``conformer`` (lucidrains pip pkg): only referenced as the base class of
  ``ConformerWrapper`` in jatts/modules/matchatts/decoder.py:204, which no
  default config instantiates.
- ``diffusers``: names imported by jatts/modules/matchatts/transformer.py;
  the Matcha U-Net estimator cannot be *constructed* without real diffusers,
  so decoder-level parity stays replica-based (documented limitation) —
  but CFM math / FS2 / VITS / conformer parity never touches it.
- ``x_transformers``, ``torchdiffeq``, ``ema_pytorch``, ``librosa``,
  ``soundfile``: only reachable from e2tts / feature-extract / vocoder
  paths we don't import here.

Nothing from the reference is copied; it is imported read-only and executed
as the golden implementation.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


_STUBBED_TOPS: set = set()
_CREATED_STUBS: list = []  # sys.modules keys we inserted, for removal


def _ensure_stub(name: str, attrs: dict) -> None:
    if name in sys.modules:
        return
    top = name.split(".")[0]
    if top not in _STUBBED_TOPS:
        try:
            if importlib.util.find_spec(top) is not None:
                return  # real package available on disk
        except (ImportError, ValueError):
            pass
        _STUBBED_TOPS.add(top)
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mod_name = ".".join(parts[:i])
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            sys.modules[mod_name] = mod
            _CREATED_STUBS.append(mod_name)
            if i > 1:
                setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)
    for k, v in attrs.items():
        setattr(sys.modules[name], k, v)


def _install_stubs() -> None:
    import torch

    def _noop_jit(*args, **kwargs):
        if args and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    class _NumbaType:
        def __getitem__(self, item):
            return self

    _nt = _NumbaType()
    _ensure_stub(
        "numba",
        {
            "jit": _noop_jit, "njit": _noop_jit, "prange": range,
            "float64": _nt, "float32": _nt, "int64": _nt, "int32": _nt,
            "int8": _nt, "boolean": _nt,
        },
    )

    class _ConformerBlock(torch.nn.Module):
        def __init__(self, *a, **k):  # pragma: no cover - never constructed
            raise NotImplementedError("conformer pip package stub")

    _ensure_stub("conformer", {"ConformerBlock": _ConformerBlock})

    class _Unbuildable(torch.nn.Module):
        def __init__(self, *a, **k):  # pragma: no cover - never constructed
            raise NotImplementedError("diffusers stub")

    _ensure_stub(
        "diffusers.models.attention",
        {
            "GEGLU": _Unbuildable,
            "GELU": _Unbuildable,
            "AdaLayerNorm": _Unbuildable,
            "AdaLayerNormZero": _Unbuildable,
            "ApproximateGELU": _Unbuildable,
        },
    )
    _ensure_stub("diffusers.models.attention_processor", {"Attention": _Unbuildable})
    _ensure_stub("diffusers.models.lora", {"LoRACompatibleLinear": torch.nn.Linear})
    _ensure_stub("diffusers.utils.torch_utils", {"maybe_allow_in_graph": lambda x: x})

    # x_transformers is absent from the image but the reference UNetT uses
    # three small pieces of it (RMSNorm, RotaryEmbedding,
    # apply_rotary_pos_emb). These are faithful reimplementations of the
    # public library (lucidrains/x-transformers >= 1.31, the version range
    # F5-TTS — the reference's stated lineage, unett.py:9 — depends on):
    # RMSNorm = l2-normalize * sqrt(d) * g; rotary uses the
    # interleaved-pair convention (freqs duplicated per pair via
    # stack+flatten, rotate_half swaps within pairs).
    class _XTRMSNorm(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.scale = dim**0.5
            self.g = torch.nn.Parameter(torch.ones(dim))

        def forward(self, x):
            return torch.nn.functional.normalize(x, dim=-1) * self.scale * self.g

    def _rotate_half(x):
        x = x.unflatten(-1, (-1, 2))
        x1, x2 = x.unbind(dim=-1)
        return torch.stack((-x2, x1), dim=-1).flatten(-2)

    def _apply_rotary_pos_emb(t, freqs, scale=1):
        rot_dim, seq_len, orig_dtype = freqs.shape[-1], t.shape[-2], t.dtype
        freqs = freqs[-seq_len:, :]
        t, t_unrotated = t[..., :rot_dim], t[..., rot_dim:]
        t = (t * freqs.cos() * scale) + (_rotate_half(t) * freqs.sin() * scale)
        return torch.cat((t, t_unrotated), dim=-1).type(orig_dtype)

    class _XTRotaryEmbedding(torch.nn.Module):
        def __init__(self, dim, base=10000.0):
            super().__init__()
            inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv_freq, persistent=False)

        def forward_from_seq_len(self, seq_len):
            t = torch.arange(seq_len, device=self.inv_freq.device)
            freqs = torch.einsum("i,j->ij", t.type_as(self.inv_freq), self.inv_freq)
            freqs = torch.stack((freqs, freqs), dim=-1).flatten(-2)
            return freqs, 1.0

    _ensure_stub("x_transformers", {"RMSNorm": _XTRMSNorm})
    _ensure_stub(
        "x_transformers.x_transformers",
        {
            "RotaryEmbedding": _XTRotaryEmbedding,
            "apply_rotary_pos_emb": _apply_rotary_pos_emb,
        },
    )
    _ensure_stub("torchdiffeq", {"odeint": None})
    _ensure_stub("torchaudio", {})
    _ensure_stub("torchaudio.transforms", {"MelSpectrogram": _Unbuildable})
    # jatts.utils.utils (read_audio etc.) imports these at module scope;
    # only used at runtime for audio IO which we never call:
    _ensure_stub("librosa", {})
    _ensure_stub("librosa.filters", {"mel": None})
    _ensure_stub("soundfile", {})


def load_reference(module: str):
    """Import ``jatts.<module>`` from /root/reference with stubs installed.

    e.g. ``load_reference("models.fastspeech2")``. Avoids the
    ``jatts.models`` star-import chain only where stubs make it safe; the
    package __init__ files at jatts/ and jatts/modules/ are empty/light.
    """
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        return importlib.import_module(f"jatts.{module}")
    finally:
        # confine stub visibility to the import window: a lingering fake
        # ``librosa`` with ``__spec__ = None`` makes any later
        # ``importlib.util.find_spec("librosa")`` (e.g. transformers'
        # availability probes) raise ValueError. The already-imported
        # reference modules keep their bound references; the next
        # load_reference() call re-installs.
        for mod_name in _CREATED_STUBS:
            sys.modules.pop(mod_name, None)
        _CREATED_STUBS.clear()
        _STUBBED_TOPS.clear()
