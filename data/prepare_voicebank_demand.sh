#!/bin/bash
# Download and prepare the Voicebank-DEMAND corpus at 16 kHz (and 24 kHz).
#
# Parity target: reference data/prepare_voicebank_demand.sh — same splits
# (val speakers p226, p287), same expected file counts
# (train 10802 / val 770 / test 824), resampling via our native tool.
#
# Requires network access (run outside the training container if egress
# is restricted).
set -e

ROOT=${1:-data/voicebank_demand}
URL_BASE="https://datashare.ed.ac.uk/bitstream/handle/10283/2791"

mkdir -p "$ROOT/raw"
cd "$ROOT/raw"

for f in clean_trainset_28spk_wav.zip noisy_trainset_28spk_wav.zip \
         clean_testset_wav.zip noisy_testset_wav.zip; do
  [ -f "$f" ] || wget "$URL_BASE/$f"
  d="${f%.zip}"
  [ -d "$d" ] || unzip -q "$f"
done
cd - > /dev/null

# split train into train/val (val speakers p226, p287 — reference line 58)
for kind in clean noisy; do
  for split in train val; do
    mkdir -p "$ROOT/48k/$split/$kind"
  done
  for w in "$ROOT"/raw/${kind}_trainset_28spk_wav/*.wav; do
    b=$(basename "$w")
    case "$b" in
      p226_*|p287_*) ln -sf "$(realpath "$w")" "$ROOT/48k/val/$kind/$b" ;;
      *) ln -sf "$(realpath "$w")" "$ROOT/48k/train/$kind/$b" ;;
    esac
  done
  mkdir -p "$ROOT/48k/test/$kind"
  for w in "$ROOT"/raw/${kind}_testset_wav/*.wav; do
    ln -sf "$(realpath "$w")" "$ROOT/48k/test/$kind/$(basename "$w")"
  done
done

# resample to 16 kHz (and optionally 24 kHz)
for fs in 16000; do
  sub=$((fs / 1000))k
  for split in train val test; do
    for kind in clean noisy; do
      python -m open_universe_tpu.prepare.resample \
        "$ROOT/48k/$split/$kind" "$ROOT/$sub/$split/$kind" --fs $fs
    done
  done
done

# sanity check file counts (reference lines 104-126)
check() {
  n=$(ls "$ROOT/16k/$1/noisy" | wc -l)
  if [ "$n" -ne "$2" ]; then
    echo "WARNING: $1 has $n files, expected $2"
  else
    echo "$1: $n files OK"
  fi
}
check train 10802
check val 770
check test 824
