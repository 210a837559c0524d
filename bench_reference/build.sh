#!/bin/bash
# Build the reference core (read-only at /root/reference) with this driver.
set -e
cd "$(dirname "$0")"
SRC=/root/reference/gbrl/src/cpp
g++ -O3 -fopenmp -std=c++14 -I"$SRC" -I/root/reference/gbrl/include \
    main.cpp \
    $SRC/gbrl.cpp $SRC/fitter.cpp $SRC/node.cpp $SRC/predictor.cpp \
    $SRC/split_candidate_generator.cpp $SRC/optimizer.cpp $SRC/scheduler.cpp \
    $SRC/loss.cpp $SRC/math_ops.cpp $SRC/types.cpp $SRC/utils.cpp \
    $SRC/shap.cpp $SRC/data_structs.cpp \
    -o ref_bench
echo built
