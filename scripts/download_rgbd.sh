#!/bin/bash
# Download the NeuralRGBD synthetic dataset (reference scripts/download_rgbd.sh).
mkdir -p data
cd data
wget http://kaldir.vc.in.tum.de/neural_rgbd/neural_rgbd_data.zip
unzip neural_rgbd_data.zip -d neural_rgbd_data
rm neural_rgbd_data.zip
