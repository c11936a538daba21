#!/bin/bash
# Download the pre-rendered Replica RGB-D sequences used by Co-SLAM
# (same source as the reference's scripts/download_replica.sh).
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
