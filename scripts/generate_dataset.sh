#!/usr/bin/env bash
# Split the master label file and render images for each split
# (reference generate_dataset.sh driver surface).
set -e

echo "<<Generating dataset splits...>>"
python -m texocr_tpu.data.factory.split_data data/master_labels.txt data -c config/data_config.yml

for split in train test val; do
  echo "<<Rendering ${split} split...>>"
  python -m texocr_tpu.data.factory.render_data "data/${split}" -c config/data_config.yml
done
