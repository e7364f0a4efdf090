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
        # extract to a temp dir and mv atomically: a killed unzip must not
        # leave a partial images/$split that the guard above would treat
        # as complete on the next run
        rm -rf "images/.${split}.partial"
        unzip -q "${split}.zip" -d "images/.${split}.partial"
        mv "images/.${split}.partial/${split}" "images/$split"
        rm -rf "images/.${split}.partial" "${split}.zip"
    fi
done

echo "COCO images ready under $DATA_DIR/images"
