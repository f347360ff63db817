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

    # e2tts / valle import chains (never exercised in these parity tests,
    # but pulled in by the jatts.models star-import):
    _ensure_stub("x_transformers", {"RMSNorm": _Unbuildable})
    _ensure_stub(
        "x_transformers.x_transformers",
        {"RotaryEmbedding": _Unbuildable, "apply_rotary_pos_emb": None},
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
    return importlib.import_module(f"jatts.{module}")
