#!/bin/bash
# JSUT tts1 recipe: external (forced-aligner) durations
# (mirrors reference egs/jsut/tts1/run.sh:84-278 stage semantics).
set -euo pipefail

stage=1
stop_stage=5
conf=conf/fastspeech2.v1.yaml
tag=""
db_root=downloads/jsut
labdir=""         # forced-alignment .lab dir (Julius output) for durations;
                  # empty = stage 0 trains the native aligner (bin/align.py)
align_steps=2000  # native-aligner training steps
train_csv=data/train.csv
dev_csv=data/dev.csv
test_csv=data/test.csv
dumpdir=dump
n_jobs=8
n_dev=250
n_test=250
vocoder=auto      # auto | griffin_lim (weights-free fallback)
serving_buckets=32,64,128   # stage 6 AOT export text-length buckets
serving_platforms=tpu,cpu

. ../../../utils/parse_options.sh

expname=$(basename "${conf%.*}")${tag:+_$tag}
expdir=exp/${expname}
BIN=../../../jatts_tpu/bin

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Download JSUT corpus to ${db_root} (manual; zero-egress images skip this)"
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python local/data_prep.py --db-root "${db_root}" --outdir data \
        --n-dev "${n_dev}" --n-test "${n_test}" \
        ${labdir:+--labdir "${labdir}"}
    if [ -z "${labdir}" ]; then
        echo "Stage 0b: Native forced alignment (no --labdir given)"
        python ${BIN}/align.py \
            --csv "${train_csv}" "${dev_csv}" "${test_csv}" \
            --config "${conf}" --outdir exp/aligner --steps "${align_steps}"
    fi
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction + statistics"
    for csv in "${train_csv}" "${dev_csv}" "${test_csv}"; do
        python ${BIN}/preprocess.py --csv "${csv}" --config "${conf}" \
            --dumpdir "${dumpdir}/$(basename "${csv%.*}")" \
            --f0-config conf/f0.yaml
    done
    python ${BIN}/compute_statistics.py --csv "${train_csv}" --config "${conf}" \
        --out "${dumpdir}/stats.h5"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Token list"
    python ${BIN}/generate_token_list.py --csv "${train_csv}" "${dev_csv}" \
        --out "${dumpdir}/tokens.txt"
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Training -> ${expdir}"
    python ${BIN}/tts_train.py \
        --train-csv "${train_csv}" --dev-csv "${dev_csv}" \
        --stats "${dumpdir}/stats.h5" --token-list "${dumpdir}/tokens.txt" \
        --config "${conf}" --outdir "${expdir}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "Stage 4: Decoding"
    python ${BIN}/tts_decode.py \
        --csv "${test_csv}" --stats "${dumpdir}/stats.h5" \
        --token-list "${dumpdir}/tokens.txt" --expdir "${expdir}" \
        --config "${expdir}/config.yml" --outdir "${expdir}/results" \
        --vocoder "${vocoder}"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "Stage 5: Objective evaluation"
    python ${BIN}/evaluate.py \
        --csv "${test_csv}" --wavdir "${expdir}/results/wav" \
        --config "${conf}" --f0-config conf/f0.yaml --n-jobs "${n_jobs}" \
        --out "${expdir}/results/eval.csv"
fi

if [ "${stage}" -le 6 ] && [ "${stop_stage}" -ge 6 ]; then
    echo "Stage 6: AOT serving export -> ${expdir}/serving.npz"
    python ${BIN}/export_serving.py \
        --config "${expdir}/config.yml" --stats "${dumpdir}/stats.h5" \
        --token-list "${dumpdir}/tokens.txt" --expdir "${expdir}" \
        --text-buckets "${serving_buckets}" --platforms "${serving_platforms}" \
        --out "${expdir}/serving.npz"
fi
