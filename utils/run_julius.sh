#!/usr/bin/env bash
# Julius forced-alignment driver (reference utils/run_julius.sh:29-39):
# resample wavs to 16k + kana transcripts -> Julius segmentation-kit ->
# per-utterance .lab files, then data_prep_post_julius.py folds them into
# the csv. The Julius binary + segment_julius.pl come from the external
# julius segmentation-kit (https://github.com/julius-speech/segmentation-kit)
# and are not shipped in this image — point --segment-kit at a checkout.
set -euo pipefail

workdir=data/julius
train_set="train"
dev_set="dev"
segment_kit=""   # path to julius segmentation-kit checkout (segment_julius.pl)
clean=false

. "$(dirname "$0")/parse_options.sh"

tempdir="${workdir}/tmp"
if ${clean}; then
    echo "Removing the temp dir ${tempdir}"
    rm -rf "${tempdir}"
fi
mkdir -p "${tempdir}"

for _set in "${train_set}" "${dev_set}"; do
    echo "Preparing Julius inputs for set ${_set}"
    python "$(dirname "$0")/prepare_julius.py" \
        --csv "data/${_set}.pre_julius.csv" \
        --outdir "${tempdir}"
done

if [ -z "${segment_kit}" ]; then
    echo "No --segment-kit given: inputs prepared under ${tempdir};"
    echo "run 'perl segment_julius.pl ${tempdir}' from a segmentation-kit checkout,"
    echo "then utils/data_prep_post_julius.py --juliusdir ${tempdir} ..."
    exit 0
fi

echo "Running Julius segmentation"
perl "${segment_kit}/segment_julius.pl" "${tempdir}" > "${workdir}/julius.log" 2>&1
echo "Done; .lab files in ${tempdir}"
