#!/usr/bin/env bash
# Train the 1000-token BPE vocab on the master label file
# (reference train_tokenizer.sh surface; training text is capped at 5M chars
# inside the CLI, matching reference tokenizer.py:278).
set -e

python -m texocr_tpu.tokenizer.cli -t -v 1000 \
  -d data/master_labels.txt \
  -s texocr_tpu/tokenizer/vocab/tokenizer_trained.txt \
  --special texocr_tpu/tokenizer/vocab/special_tokens.txt
