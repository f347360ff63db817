#!/bin/bash
# Hi-Fi-Captain tts3: VALL-E two-stage recipe (AR stage 3, NAR stage 4,
# decode stage 5 — mirrors reference egs/hificaptain_jp_female/tts3/run.sh:154-258).
set -euo pipefail

stage=1
stop_stage=5
ar_conf=conf/valle_ar.given.bs32.yaml
nar_conf=conf/valle_nar.given.bs32.yaml
tag=""
db_root=downloads/hi-fi-captain/ja-JP/female
transcript=""   # "utt:text" lines (stage 0 data prep)
n_dev=100
n_test=100
train_csv=data/train.csv
dev_csv=data/dev.csv
test_csv=data/test.csv
dumpdir=dump
codec_path=""   # local EnCodec weights dir for transformers.EncodecModel
decode_max_steps=1000

. ../../../utils/parse_options.sh

ar_exp=exp/$(basename "${ar_conf%.*}")${tag:+_$tag}
nar_exp=exp/$(basename "${nar_conf%.*}")${tag:+_$tag}
BIN=../../../jatts_tpu/bin

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation (random train-utterance prompts)"
    python local/data_prep.py --db-root "${db_root}" \
        --transcript "${transcript}" --outdir data \
        --n-dev "${n_dev}" --n-test "${n_test}"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: EnCodec feature extraction"
    for csv in "${train_csv}" "${dev_csv}" "${test_csv}"; do
        python ${BIN}/preprocess.py --csv "${csv}" --config "${ar_conf}" \
            --dumpdir "${dumpdir}/$(basename "${csv%.*}")"
    done
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Token list"
    python ${BIN}/generate_token_list.py --csv "${train_csv}" "${dev_csv}" \
        --out "${dumpdir}/tokens.txt"
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: AR training -> ${ar_exp}"
    python ${BIN}/tts_train.py \
        --train-csv "${train_csv}" --dev-csv "${dev_csv}" \
        --stats "${dumpdir}/stats.h5" --token-list "${dumpdir}/tokens.txt" \
        --config "${ar_conf}" --outdir "${ar_exp}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "Stage 4: NAR training -> ${nar_exp}"
    python ${BIN}/tts_train.py \
        --train-csv "${train_csv}" --dev-csv "${dev_csv}" \
        --stats "${dumpdir}/stats.h5" --token-list "${dumpdir}/tokens.txt" \
        --config "${nar_conf}" --outdir "${nar_exp}"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "Stage 5: Two-stage decoding"
    python ${BIN}/ttslm_decode.py \
        --csv "${test_csv}" --token-list "${dumpdir}/tokens.txt" \
        --ar-expdir "${ar_exp}" --ar-config "${ar_exp}/config.yml" \
        --nar-expdir "${nar_exp}" --nar-config "${nar_exp}/config.yml" \
        ${codec_path:+--codec-path "${codec_path}"} \
        --max-steps "${decode_max_steps}" \
        --outdir "${ar_exp}/results"
fi
