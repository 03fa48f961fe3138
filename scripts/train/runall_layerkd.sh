#!/usr/bin/env bash
# Generated serial runner.
set -e
bash scripts/train/layerkd_layeralpha0.sh
bash scripts/train/layerkd_layeralpha001.sh
bash scripts/train/layerkd_layeralpha01.sh
bash scripts/train/layerkd_layeralpha05.sh
bash scripts/train/layerkd_layeralpha1.sh
bash scripts/train/layerkd_layeralpha2.sh
bash scripts/train/layerkd_layeralpha5.sh
