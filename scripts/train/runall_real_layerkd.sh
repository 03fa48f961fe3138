#!/usr/bin/env bash
# Generated serial runner.
set -e
bash scripts/train/real_layerkd_layeralpha001.sh
bash scripts/train/real_layerkd_layeralpha005.sh
bash scripts/train/real_layerkd_layeralpha01.sh
bash scripts/train/real_layerkd_layeralpha05.sh
bash scripts/train/real_layerkd_layeralpha1.sh
bash scripts/train/real_layerkd_layeralpha5.sh
bash scripts/train/real_layerkd_layeralpha10.sh
