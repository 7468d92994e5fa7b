#!/usr/bin/env bash
# Build dataset pickles for each split (reference generate_pickles.sh surface).
set -e

for split in train test val; do
  echo "<<Generating pickle file for ${split} split...>>"
  python -m texocr_tpu.data.factory.pickle_data -c config/data_config.yml \
    --split "${split}" -s "data/${split}/${split}set.pkl"
done
