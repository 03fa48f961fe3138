# coding=utf-8
"""Common Voice 7.0 release statistics.

The reference vendors Mozilla's full 50 KB corpus-stats dict
(reference release_stats.py — R18 in SURVEY.md §2.1). The builder
(commonvoice_asr.py) only consumes: `version`, `name`, `date`,
`bundleURLTemplate`, `totalValidHrs`, and `locales` (per-locale dicts whose
values drive config descriptions / size strings). This module ships the
consumed skeleton with the English stats (the locale the KD pipeline
evaluates: asr_inference_CV.py), plus a loader that merges the full official
dict from a local JSON when present (`CV_RELEASE_STATS_JSON` env var) —
this environment has no network to refetch the original."""

import json
import os

STATS = {
    "version": "7.0.0",
    "name": "Common Voice Corpus 7.0",
    "date": "2021-07-21",
    "multilingual": True,
    "bundleURLTemplate":
        "cv-corpus-7.0-2021-07-21/cv-corpus-7.0-2021-07-21-{locale}.tar.gz",
    "totalValidHrs": 11192,
    "locales": {
        "en": {
            "buckets": {"dev": 16284, "invalidated": 220015, "other": 220176,
                        "reported": 2732, "test": 16284, "train": 759975,
                        "validated": 1425784},
            "reportedSentences": 2679,
            "duration": 9493711987,
            "clips": 1865909,
            "splits": {"accent": {}, "age": {}, "gender": {}},
            "users": 75879,
            "size": 66591655366,
            "checksum": "",
            "avgDurationSecs": 5.088,
            "validDurationSecs": 7255142.0,
            "totalHrs": 2637.14,
            "validHrs": 2015.31,
        },
    },
}

_OVERRIDE = os.environ.get("CV_RELEASE_STATS_JSON")
if _OVERRIDE and os.path.isfile(_OVERRIDE):
    with open(_OVERRIDE, encoding="utf-8") as _f:
        STATS.update(json.load(_f))
