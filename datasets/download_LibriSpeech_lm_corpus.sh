#!/bin/sh
# Download the normalized LibriSpeech LM training corpus (40M lines).
set -e
TARGET=${1:-datasets}
mkdir -p "$TARGET"
wget -c "https://www.openslr.org/resources/11/librispeech-lm-norm.txt.gz" -P "$TARGET"
gunzip -kf "$TARGET/librispeech-lm-norm.txt.gz"
