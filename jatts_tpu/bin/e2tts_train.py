"""E2-TTS trainer CLI (reference jatts/bin/e2tts_train.py:44-375).

Thin alias over tts_train: the reference's Accelerate launch / apex DDP /
DynamicBatchSampler specialization all collapse into the generic trainer —
frame-budget batching is selected by ``batch_size_per_gpu`` in the config,
EMA by ``ema_decay``, data parallelism by the mesh.
"""

import os as _os
import sys as _sys

# allow direct execution (python jatts_tpu/bin/<tool>.py) from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

# persistent XLA compile cache: CLI stages are separate processes; without
# this every stage repays full compilation
import jax as _jax

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # default persistent cache; an env override wins (e.g. tests point it at
    # the committed suite cache -- stale AOT entries compiled on another
    # machine load-fail loudly and slowly, see CLAUDE.md)
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/jatts_tpu/xla"),
    )
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jatts_tpu.bin.tts_train import main

if __name__ == "__main__":
    main()
