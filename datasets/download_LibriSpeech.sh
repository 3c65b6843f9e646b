#!/bin/sh
# Download and extract all LibriSpeech splits (reference datasets/ equivalent).
# Usage: sh datasets/download_LibriSpeech.sh [target_dir]
set -e
TARGET=${1:-datasets}
mkdir -p "$TARGET"
for split in \
    train-clean-100 train-clean-360 train-other-500 \
    dev-clean dev-other test-clean test-other; do
    echo "downloading $split"
    wget -c "https://www.openslr.org/resources/12/${split}.tar.gz" -P "$TARGET"
    tar -xzf "$TARGET/${split}.tar.gz" -C "$TARGET"
done
