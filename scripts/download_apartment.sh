#!/bin/bash
# Download the NICE-SLAM Azure apartment capture (reference scripts/download_apartment.sh).
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
unzip Apartment.zip
