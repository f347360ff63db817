"""Stage-5 objective evaluation (reference jatts/bin/evaluate.py:1-330).

Metrics: MCD / F0RMSE / F0CORR / DDUR (DTW-based, always available), CER via
a local Levenshtein (ASR model gated — requires nue-asr weights), speaker
cosine similarity (gated on speechbrain), SHEET MOS (gated on torch.hub).
Results printed as an aligned table and written to results.csv.
"""

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
import logging
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np
import yaml

from jatts_tpu.evaluate.dtw_based import calculate_mcd_f0
from jatts_tpu.utils.io import read_audio, read_csv


def levenshtein(a: str, b: str) -> int:
    """Edit distance (replaces the jiwer dependency for CER)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def edit_counts(ref, hyp):
    """Alignment counts (hits, substitutions, deletions, insertions) of
    hyp vs ref token sequences — what jiwer's compute_measures returns and
    the reference's corpus-level error rate is built from
    (jatts/bin/evaluate.py:104-112)."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, hits, sub, del, ins) — cost-first tuple comparison
    prev = [(j, 0, 0, 0, j) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i, 0)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                c, h, s, d, ins = prev[j - 1]
                cand = (c, h + 1, s, d, ins)
            else:
                c, h, s, d, ins = prev[j - 1]
                cand = (c + 1, h, s + 1, d, ins)
            c, h, s, d, ins = prev[j]
            cand = min(cand, (c + 1, h, s, d + 1, ins))
            c, h, s, d, ins = cur[j - 1]
            cand = min(cand, (c + 1, h, s, d, ins + 1))
            cur.append(cand)
        prev = cur
    _, h, s, d, ins = prev[-1]
    return {"hits": h, "substitutions": s, "deletions": d, "insertions": ins}


def normalize_sentence(sentence: str) -> str:
    """The reference's ASR-eval normalization (jatts/bin/evaluate.py:35-43):
    uppercase, strip punctuation, then pyopenjtalk kana reading so CER
    compares pronunciations, not orthography. pyopenjtalk is gated in this
    image — without it the punctuation-stripped text is compared directly
    (exact for kana/ASCII, a documented divergence for kanji)."""
    import unicodedata

    sentence = sentence.upper()
    sentence = "".join(
        ch for ch in sentence if not unicodedata.category(ch).startswith("P")
    )
    try:
        import pyopenjtalk  # noqa: PLC0415

        sentence = pyopenjtalk.g2p(sentence, kana=True)
    except ImportError:
        pass
    return sentence


def _worker_init():
    """Force CPU in pool workers BEFORE any backend initializes: the
    metric path runs jitted jax ops, and N extra jax processes contending
    for a (single-client) TPU runtime can silently kill the main process —
    WORLD/MCD work is CPU-appropriate anyway."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backend already up; proceed
        pass


def _eval_one(task):
    utt, gen_path, ref_path, sr, f0min, f0max, mcep_method = task
    gen, _ = read_audio(gen_path, sr)
    ref, _ = read_audio(ref_path, sr)
    m = calculate_mcd_f0(gen, ref, sr, f0min, f0max, mcep_method=mcep_method)
    m["utt_id"] = utt
    return m


def _load_asr(args):
    """Reference-shaped ASR loader (jatts/bin/evaluate.py:25-49): when the
    ``nue_asr`` package is importable, load the model EXACTLY the way the
    reference does — nue_asr.load_model + load_tokenizer, transcription on
    audio center-padded by 1 s (librosa.util.pad_center(size=len+16000) ==
    8000 samples each side) — so real rinna/nue-asr weights work unchanged.
    Falls back to a generic ``transformers`` ASR pipeline (any local CTC /
    seq2seq checkpoint via --asr-path). Returns transcribe(wav16k)->text or
    None."""
    name = getattr(args, "asr_path", None)
    try:
        import nue_asr  # noqa: PLC0415 — gated; not in this image

        model = nue_asr.load_model(name or "rinna/nue-asr")
        tokenizer = nue_asr.load_tokenizer(name or "rinna/nue-asr")

        def transcribe(wav):
            audio = np.pad(np.asarray(wav, np.float32), (8000, 8000))
            return nue_asr.transcribe(model, tokenizer, audio).text

        return transcribe
    except ImportError:
        pass
    except Exception as e:  # noqa: BLE001 — weights missing/corrupt
        logging.warning(f"nue_asr present but failed to load ({e}); "
                        "trying the generic pipeline")
    try:
        from transformers import pipeline  # noqa: PLC0415

        asr = pipeline("automatic-speech-recognition", model=name)
        # raw-array input: a filename path would need ffmpeg (absent here);
        # the reference also feeds arrays (evaluate.py:95-99 via librosa)
        return lambda wav: asr({"raw": wav, "sampling_rate": 16000})["text"]
    except Exception as e:  # noqa: BLE001
        logging.warning(f"ASR unavailable ({e}); skipping CER")
        return None


def _eval_asr(tasks, rows, sr, args):
    """CER via a local ASR model (gated — the reference uses rinna/nue-asr
    + pyopenjtalk kana normalization, evaluate.py:35-112; weights are not in
    this image, so this requires --asr-path with local weights)."""
    transcribe = _load_asr(args)
    if transcribe is None:
        return None
    ref_by_utt = {r["sample_id"]: r.get("original_text", "") for r in rows}
    keys = ("hits", "substitutions", "deletions", "insertions")
    c_tot = {k: 0 for k in keys}
    w_tot = {k: 0 for k in keys}
    for utt, gen_path, *_ in tasks:
        wav, _ = read_audio(gen_path, 16000)
        hyp = normalize_sentence(transcribe(wav))
        ref = normalize_sentence(ref_by_utt.get(utt, ""))
        for tot, r, h in ((c_tot, ref, hyp),
                          (w_tot, ref.split(), hyp.split())):
            for k, v in edit_counts(r, h).items():
                tot[k] += v

    # corpus-level rates over pooled counts (reference evaluate.py:104-112)
    def er(r):
        den = r["substitutions"] + r["deletions"] + r["hits"]
        return 100.0 * (r["substitutions"] + r["deletions"]
                        + r["insertions"]) / max(den, 1)

    cer, wer = er(c_tot), er(w_tot)
    print(f"CER: {cer:.2f}%  WER: {wer:.2f}%")
    return cer


def _eval_spkemb(tasks, sr, model_path=None):
    """Speaker cosine similarity (reference evaluate.py:217-244). Uses the
    native JAX ECAPA (features/ecapa.py) with a local speechbrain
    ``embedding_model.ckpt`` when ``--spkemb-model`` is given; falls back to
    the speechbrain package; skips otherwise."""
    encode = None
    if model_path:
        from jatts_tpu.features.ecapa import EcapaSpkEmbExtractor  # noqa: PLC0415

        ex = EcapaSpkEmbExtractor(model_path)
        encode = lambda wav: ex(wav)  # noqa: E731
    else:
        try:
            import torch  # noqa: PLC0415
            from speechbrain.pretrained import EncoderClassifier  # noqa: PLC0415

            clf = EncoderClassifier.from_hparams(
                "speechbrain/spkrec-ecapa-voxceleb"
            )

            def encode(wav):
                with torch.no_grad():
                    return clf.encode_batch(
                        torch.from_numpy(wav)[None]
                    ).numpy().reshape(-1)

        except Exception as e:  # noqa: BLE001
            logging.warning(f"speechbrain unavailable ({e}); skipping spkemb sim")
            return None

    sims = []
    for utt, gen_path, ref_path, *_ in tasks:
        embs = []
        for p in (gen_path, ref_path):
            wav, _ = read_audio(p, 16000)
            embs.append(encode(wav))
        e1, e2 = embs
        sims.append(
            float(np.dot(e1, e2) / max(np.linalg.norm(e1) * np.linalg.norm(e2), 1e-9))
        )
    sim = float(np.mean(sims))
    print(f"spkemb cosine similarity: {sim:.4f}")
    return sim


def _eval_sheet(tasks, source=None):
    """SHEET MOS prediction (gated on torch.hub — reference
    evaluate.py:246-267 loads unilight/sheet:v0.1.0; zero-egress images pass
    ``--sheet-source`` pointing at a local hubconf dir)."""
    try:
        import torch  # noqa: PLC0415

        predictor = torch.hub.load(
            source or "unilight/sheet:v0.1.0", "default", trust_repo=True,
            **({"source": "local"} if source else {"force_reload": True}),
        )
    except Exception as e:  # noqa: BLE001
        logging.warning(f"SHEET unavailable ({e}); skipping MOS")
        return None
    scores = [float(predictor.predict(wav_path=gen)) for _, gen, *_ in tasks]
    mos = float(np.mean(scores))
    print(f"SHEET score: {mos:.3f}")
    return mos


def main():
    parser = argparse.ArgumentParser(description="Objective evaluation (stage 5).")
    parser.add_argument("--csv", required=True, help="test-set csv with wav_path refs")
    parser.add_argument("--wavdir", required=True, help="generated wav directory")
    parser.add_argument("--config", required=True)
    parser.add_argument("--f0-config", default=None)
    parser.add_argument("--metrics", nargs="+", default=["mcd"])
    parser.add_argument("--n-jobs", type=int, default=8)
    parser.add_argument("--asr-path", default=None, help="local ASR weights for CER")
    parser.add_argument(
        "--sheet-source", default=None,
        help="local torch.hub dir with the SHEET predictor (zero-egress)",
    )
    parser.add_argument(
        "--spkemb-model", default=None,
        help="local speechbrain embedding_model.ckpt for the native JAX "
             "ECAPA spkemb similarity (zero-egress)",
    )
    parser.add_argument(
        "--mcep-method", default="world", choices=["world", "dct"],
        help="mcep extractor: 'world' = CheapTrick+sp2mc (tech-report scale), "
             "'dct' = fast DCT-of-log-mel (NOT comparable to published MCDs)",
    )
    parser.add_argument("--out", default=None, help="results csv")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(
        force=True,
        level=logging.INFO if args.verbose > 0 else logging.WARNING)

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    sr = int(config.get("sampling_rate", 24000))

    f0_ranges = {}
    if args.f0_config and os.path.exists(args.f0_config):
        with open(args.f0_config) as f:
            f0_ranges = yaml.load(f, Loader=yaml.SafeLoader) or {}

    rows, _ = read_csv(args.csv, dict_reader=True)
    tasks = []
    for row in rows:
        utt = row["sample_id"]
        gen_path = os.path.join(args.wavdir, f"{utt}.wav")
        if not os.path.exists(gen_path):
            logging.warning(f"missing generated wav for {utt}")
            continue
        spk = row.get("spk", "")
        f0min = float(f0_ranges.get(spk, {}).get("f0min", 40))
        f0max = float(f0_ranges.get(spk, {}).get("f0max", 800))
        tasks.append((utt, gen_path, row["wav_path"], sr, f0min, f0max, args.mcep_method))

    if "asr" in args.metrics:
        _eval_asr(tasks, rows, sr, args)
    if "spkemb" in args.metrics:
        _eval_spkemb(tasks, sr, args.spkemb_model)
    if "sheet" in args.metrics:
        _eval_sheet(tasks, source=args.sheet_source)

    results = []
    if "mcd" in args.metrics:
        # process-parallel like the reference's mp.Manager fan-out
        # (evaluate.py:277-299)
        if args.n_jobs > 1:
            import multiprocessing

            # spawn (not fork): forked children would inherit the parent's
            # already-initialized jax backend state
            with ProcessPoolExecutor(
                max_workers=args.n_jobs,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_worker_init,
            ) as ex:
                results = list(ex.map(_eval_one, tasks))
        else:
            results = [_eval_one(t) for t in tasks]

    if results:
        keys = ["mcd", "f0rmse", "f0corr", "ddur"]
        header = f"{'utt_id':<24}" + "".join(f"{k:>10}" for k in keys)
        print(header)
        print("-" * len(header))
        for m in sorted(results, key=lambda r: r["utt_id"]):
            print(
                f"{m['utt_id']:<24}"
                + "".join(f"{m[k]:>10.4f}" for k in keys)
            )
        print("-" * len(header))
        means = {k: float(np.nanmean([m[k] for m in results])) for k in keys}
        print(f"{'mean':<24}" + "".join(f"{means[k]:>10.4f}" for k in keys))
        if args.out:
            import csv as _csv

            with open(args.out, "w", newline="") as f:
                w = _csv.DictWriter(f, fieldnames=["utt_id", *keys])
                w.writeheader()
                for m in results:
                    w.writerow({k: m[k] for k in ["utt_id", *keys]})


if __name__ == "__main__":
    main()
