#!/bin/sh
# Build the native components into native/lib/ and native/decode/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -shared -fPIC -std=c++17 tokenizer/clip_bpe.cpp -o lib/libclip_bpe.so
echo "built native/lib/libclip_bpe.so"
g++ -O2 -shared -fPIC -std=c++17 decode/video_decode.cpp \
    -I/usr/include/opencv4 \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lopencv_videoio \
    -lpthread -o decode/libvideo_decode.so
echo "built native/decode/libvideo_decode.so"
