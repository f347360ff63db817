"""Build tokens.txt from the phoneme column
(reference jatts/bin/generate_token_list.py:260-313): counts space-split
phonemes, writes <blank>, <unk>, vocabulary, <sos/eos>."""

from __future__ import annotations

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

import argparse
from collections import Counter

from jatts_tpu.utils.io import read_csv


def main():
    parser = argparse.ArgumentParser(description="Generate token list (stage 2).")
    parser.add_argument("--csv", nargs="+", required=True)
    parser.add_argument("--out", required=True, help="output tokens.txt")
    parser.add_argument("--column", default="phonemes")
    parser.add_argument("--cutoff", type=int, default=0)
    args = parser.parse_args()

    counter = Counter()
    for path in args.csv:
        rows, _ = read_csv(path, dict_reader=True)
        for row in rows:
            counter.update(row[args.column].split(" "))
    vocab = [t for t, c in counter.most_common() if c > args.cutoff and t]
    tokens = ["<blank>", "<unk>", *sorted(vocab), "<sos/eos>"]
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("\n".join(tokens) + "\n")
    print(f"wrote {len(tokens)} tokens to {args.out}")


if __name__ == "__main__":
    main()
