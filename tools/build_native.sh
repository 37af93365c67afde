#!/bin/sh
# Build the native runtime tier (latent_loader.so) with the baked-in g++.
set -e
cd "$(dirname "$0")/.."
mkdir -p mapdit_tpu/native
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    native/latent_loader.cc -o mapdit_tpu/native/liblatent_loader.so
echo "built mapdit_tpu/native/liblatent_loader.so"
