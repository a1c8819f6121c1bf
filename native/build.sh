#!/bin/sh
# Build the native components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -shared -fPIC -std=c++17 tokenizer/clip_bpe.cpp -o lib/libclip_bpe.so
echo "built native/lib/libclip_bpe.so"
