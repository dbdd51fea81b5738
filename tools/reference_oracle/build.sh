#!/bin/sh
# Build the REFERENCE CPU decoder (sources compiled in place from
# /root/reference, read-only) as the bit-exactness oracle.
cd "$(dirname "$0")"
exec g++ -O2 -std=c++17 -I/root/reference/inc -I/root/reference/inc/common \
    -I/root/reference/inc/decoder -Istubs -o reference_oracle \
    wrap_refsrc.cpp oracle_main.cpp -lpthread
