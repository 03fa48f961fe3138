#!/usr/bin/env bash
# Generated serial runner.
set -e
bash scripts/train/logitkd_temp1_alpha01.sh
bash scripts/train/logitkd_temp1_alpha05.sh
bash scripts/train/logitkd_temp1_alpha1.sh
bash scripts/train/logitkd_temp2_alpha01.sh
bash scripts/train/logitkd_temp2_alpha05.sh
bash scripts/train/logitkd_temp2_alpha1.sh
bash scripts/train/logitkd_temp4_alpha01.sh
bash scripts/train/logitkd_temp4_alpha05.sh
bash scripts/train/logitkd_temp4_alpha1.sh
