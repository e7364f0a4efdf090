#!/usr/bin/env bash
# Download COCO images for VQAv2 (parity with reference common/download_coco.sh)
set -euo pipefail

DATA_DIR="${DATA_DIR:-/data/coco}"
mkdir -p "$DATA_DIR/images"
cd "$DATA_DIR"

for split in train2014 val2014 test2015; do
    if [ ! -d "images/$split" ]; then
        echo "Downloading $split..."
        wget -q "http://images.cocodataset.org/zips/${split}.zip"
        unzip -q "${split}.zip" -d images/
        rm "${split}.zip"
    fi
done

echo "COCO images ready under $DATA_DIR/images"
