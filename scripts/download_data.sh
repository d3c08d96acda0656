#!/bin/bash
# Dataset fetch helper (reference: scripts/download_data.sh).
# Downloads the IDR-preprocessed DTU scans, the DTU evaluation assets
# (Points/stl + ObsMask), and the BlendedMVS scenes into datasets/.
# NOTE: this build environment has no network egress — run this on a
# connected machine and copy datasets/ over.
set -e
mkdir -p datasets
cd datasets

echo "== DTU (IDR preprocessing) =="
# IDR-preprocessed scans (per-scan image/ + cameras.npz):
#   https://www.dropbox.com/sh/w0y8bbdmxzik3uk/AAAaZffBiJevxQzRskoOYcyja (DTU.zip)
# Official evaluation assets (SampleSet: ObsMask + Points/stl):
#   http://roboimagedata.compute.dtu.dk/?page_id=36
echo "fetch DTU.zip (IDR) and the DTU SampleSet, then unpack as:"
echo "  datasets/DTU/scanXX/image/*.png + cameras.npz"
echo "  datasets/DTU/Points/stl/stlXXX_total.ply"
echo "  datasets/DTU/ObsMask/ObsMaskXX_10.mat + PlaneXX.mat"

echo "== BlendedMVS =="
# The subset used by the reference (scan2/6/7/9 with IDR-style cameras):
#   https://www.dropbox.com/sh/qpir4hjnli4o7gv/AABSxdqrkCZqbaPoAyD5Kvvda (BlendedMVS.zip)
echo "fetch BlendedMVS.zip, unpack as datasets/BlendedMVS/scanX/image + cameras.npz"

echo "== Nerfstudio captures =="
echo "process your capture with 'ns-process-data' and place the resulting"
echo "transforms.json + images under datasets/nerfstudio/<tag>/"
