#!/bin/sh
# Build the native runtime libraries:
#   libouniv_audio.so — WAV I/O + polyphase resampler + manifest scan
#   libouniv_pesq.so  — P.862-family perceptual quality scorer
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libouniv_audio.so audio_io.cpp -lm
g++ -O3 -march=native -shared -fPIC -o libouniv_pesq.so pesq.cpp -lm
echo "built $(pwd)/libouniv_audio.so $(pwd)/libouniv_pesq.so"
