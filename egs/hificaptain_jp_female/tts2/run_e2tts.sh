#!/bin/bash
# Hi-Fi-Captain tts2: E2-TTS recipe (mirrors reference
# egs/hificaptain_jp_female/tts2/run_e2tts.sh). Data-parallel over all local
# chips via the mesh; multi-host via --multihost (replaces the reference's
# accelerate / multinode NCCL stack).
set -euo pipefail

stage=0
stop_stage=5
conf=conf/e2tts.v1.yaml
tag=""
db_root=downloads/hi-fi-captain/ja-JP/female
fs=48000              # corpus sampling rate (data prep trim/read)
train_csv=data/train.csv
dev_csv=data/dev.csv
test_csv=data/test.csv
dumpdir=dump
multihost=false
vocoder=auto          # auto | griffin_lim (weights-free fallback)
decode_max_frames=3000

. ../../../utils/parse_options.sh

expdir=exp/$(basename "${conf%.*}")${tag:+_$tag}
BIN=../../../jatts_tpu/bin

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    python local/data_prep.py --db-root "${db_root}" --outdir data --sampling-rate "${fs}"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    for csv in "${train_csv}" "${dev_csv}" "${test_csv}"; do
        python ${BIN}/preprocess.py --csv "${csv}" --config "${conf}" \
            --dumpdir "${dumpdir}/$(basename "${csv%.*}")"
    done
    python ${BIN}/compute_statistics.py --csv "${train_csv}" --config "${conf}" \
        --out "${dumpdir}/stats.h5"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    python ${BIN}/generate_token_list.py --csv "${train_csv}" "${dev_csv}" \
        --out "${dumpdir}/tokens.txt"
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    python ${BIN}/tts_train.py \
        --train-csv "${train_csv}" --dev-csv "${dev_csv}" \
        --stats "${dumpdir}/stats.h5" --token-list "${dumpdir}/tokens.txt" \
        --config "${conf}" --outdir "${expdir}" \
        $([ "${multihost}" = true ] && echo --multihost)
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    python ${BIN}/e2tts_decode.py \
        --csv "${test_csv}" --stats "${dumpdir}/stats.h5" \
        --token-list "${dumpdir}/tokens.txt" --expdir "${expdir}" \
        --config "${expdir}/config.yml" --vocoder "${vocoder}" \
        --max-frames "${decode_max_frames}" --outdir "${expdir}/results"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    python ${BIN}/evaluate.py \
        --csv "${test_csv}" --wavdir "${expdir}/results/wav" \
        --config "${conf}" --out "${expdir}/results/eval.csv"
fi
