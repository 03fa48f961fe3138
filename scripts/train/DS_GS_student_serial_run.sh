#!/usr/bin/env bash
# Generated serial runner.
set -e
bash scripts/train/DS_GSs_student.sh
bash scripts/train/DS_GSxs_student.sh
