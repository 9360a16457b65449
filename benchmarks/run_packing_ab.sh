#!/usr/bin/env bash
# One-shot on-chip A/B of the cluster-packing candidates (ROADMAP item 1).
# Run on the TPU host; ~2 min per row incl. compile. The chip-free pricing
# (experiment_pack.json) predicts: default 140.9G lane-ops, descend=128
# 121.5G (-14%), dp_kc=0.5 120.8G — this measures what the scalar
# traversal cost (which the model's kc constant only approximates) does
# to those predictions.
set -e
cd "$(dirname "$0")/.."
for args in "" "--descend 96" "--descend 128" "--align dp --dp-kc 0.5" \
            "--align dp --dp-kc 0.25"; do
  echo "=== time_config3 $args"
  python benchmarks/time_config3.py $args
done
