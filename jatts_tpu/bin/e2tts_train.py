"""E2-TTS trainer CLI (reference jatts/bin/e2tts_train.py:44-375).

Thin alias over tts_train: the reference's Accelerate launch / apex DDP /
DynamicBatchSampler specialization all collapse into the generic trainer —
frame-budget batching is selected by ``batch_size_per_gpu`` in the config,
EMA by ``ema_decay``, data parallelism by the mesh.
"""

from jatts_tpu.bin.tts_train import main

if __name__ == "__main__":
    main()
