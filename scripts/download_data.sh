#!/bin/bash
# Fetch MIND-small train/dev and GloVe 840B.300d into data/ — the
# reference's download_data.sh:1-19 behavior. Needs network access; in
# offline environments use the synthetic generator
# (newsrecommendation_tpu.data.synthetic) or pre-staged data instead.
set -euo pipefail

mkdir -p data
cd data

if [ ! -d MINDsmall_train ]; then
  wget -q --show-progress https://mind201910small.blob.core.windows.net/release/MINDsmall_train.zip
  unzip -q MINDsmall_train.zip -d MINDsmall_train && rm MINDsmall_train.zip
fi

if [ ! -d MINDsmall_dev ]; then
  wget -q --show-progress https://mind201910small.blob.core.windows.net/release/MINDsmall_dev.zip
  unzip -q MINDsmall_dev.zip -d MINDsmall_dev && rm MINDsmall_dev.zip
fi

# GloVe is only needed for the word-id title pipeline with pretrained
# vectors (--glove_embedding_path); skip with NO_GLOVE=1.
if [ -z "${NO_GLOVE:-}" ] && [ ! -f glove.840B.300d.txt ]; then
  wget -q --show-progress https://nlp.stanford.edu/data/glove.840B.300d.zip
  unzip -q glove.840B.300d.zip && rm glove.840B.300d.zip
fi

echo "data/ ready"
