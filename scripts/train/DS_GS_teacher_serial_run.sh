#!/usr/bin/env bash
# Generated serial runner.
set -e
bash scripts/train/DS_GSs_teacher.sh
bash scripts/train/DS_GSxs_teacher.sh
