#!/bin/sh
# Build the reference-solver parity oracle (tests/parity/oracle_main.cc).
#
# Eigen comes from TensorFlow's bundled headers (the image has no system
# Eigen); the reference's minimal.cc is compiled straight from
# /root/reference/src — nothing is copied into this repo.
set -e
here="$(cd "$(dirname "$0")" && pwd)"
ref="${RSSFM_REFERENCE_SRC:-/root/reference/src}"
eigen="$(python3 - <<'EOF'
import os, tensorflow as tf
print(os.path.join(os.path.dirname(tf.__file__), "include"))
EOF
)"
mkdir -p "$here/build"
# One mechanical API shim: the reference targets Eigen 3.2/3.3 where
# JacobiSVD accepted an Array expression; TF's Eigen (3.4.90) requires
# .matrix().  Patched into a build-dir copy — numerics are identical and
# nothing is checked in.
sed 's/JacobiSVD<MatrixZ> svd(z,/JacobiSVD<MatrixZ> svd(z.matrix(),/' \
    "$ref/minimal.cc" > "$here/build/minimal_patched.cc"
g++ -O2 -std=c++17 -w \
    -I "$here/stub" -I "$ref" -I "$eigen" \
    "$here/oracle_main.cc" "$here/build/minimal_patched.cc" \
    -o "$here/build/rs_oracle"
rm -f "$here/build/minimal_patched.cc"
echo "built $here/build/rs_oracle"
