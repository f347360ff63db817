#!/usr/bin/env python3
"""Download pretrained assets from HuggingFace Hub (reference
utils/hf_download.py). Gated: requires network + huggingface_hub; in
zero-egress environments place weights locally and point configs at them."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repo-id", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--filename", default=None)
    args = parser.parse_args()
    try:
        from huggingface_hub import hf_hub_download, snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub not installed (zero-egress image?); "
            "provide the weights locally instead"
        )
    if args.filename:
        path = hf_hub_download(args.repo_id, args.filename, local_dir=args.outdir)
    else:
        path = snapshot_download(args.repo_id, local_dir=args.outdir)
    print(path)


if __name__ == "__main__":
    main()
