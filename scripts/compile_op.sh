#!/bin/bash
# Build the native host library (cut-pursuit + connected components).
# Reference compile_op.sh built the CPU KNN + grid-subsampling extensions;
# those ops are on-device kernels here (ssdr_al_tpu/ops/), so only the serial
# graph solver stays native.
set -e
make -C "$(dirname "$0")/../native"
