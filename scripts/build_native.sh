#!/bin/sh
# Build the native framepack extension and install it into truely_tpu/media/.
set -e
cd "$(dirname "$0")/../native"
python setup.py build_ext --inplace >/dev/null
mv -f framepack*.so ../truely_tpu/media/
mv -f videodec*.so ../truely_tpu/media/ 2>/dev/null || true
mv -f videoenc*.so ../truely_tpu/media/ 2>/dev/null || true
rm -rf build
echo "built: $(ls ../truely_tpu/media/framepack*.so)"
