# coding=utf-8
"""Mozilla Common Voice dataset builder (HF `datasets` script).

Rebuild of the reference builder (reference commonvoice_asr.py:47-260 — R18
in SURVEY.md §2.1): per-locale configs from `release_stats.STATS`, bundles
resolved via the Mozilla CV API (HF token required + download logged, as the
corpus license demands), mp3 clips at 48 kHz, splits train/test/validation/
other/invalidated from the bundle's TSVs."""

import csv
import os
import urllib.parse

import datasets

from release_stats import STATS

_HOMEPAGE = "https://commonvoice.mozilla.org/en/datasets"
_LICENSE = "https://creativecommons.org/publicdomain/zero/1.0/"
_API_URL = "https://commonvoice.mozilla.org/api/v1"

_CITATION = """\
@inproceedings{commonvoice:2020,
  author = {Ardila, R. and Branson, M. and Davis, K. and Henretty, M. and Kohler, M. and Meyer, J. and Morais, R. and Saunders, L. and Tyers, F. M. and Weber, G.},
  title = {Common Voice: A Massively-Multilingual Speech Corpus},
  booktitle = {Proceedings of the 12th Conference on Language Resources and Evaluation (LREC 2020)},
  pages = {4211--4215},
  year = 2020
}
"""

_SPLIT_TSVS = [
    (datasets.Split.TRAIN, "train.tsv"),
    (datasets.Split.TEST, "test.tsv"),
    (datasets.Split.VALIDATION, "dev.tsv"),
    ("other", "other.tsv"),
    ("invalidated", "invalidated.tsv"),
]


class CommonVoiceConfig(datasets.BuilderConfig):
    def __init__(self, name, version, **kwargs):
        self.language = kwargs.pop("language", None)
        self.release_date = kwargs.pop("release_date", None)
        self.num_clips = kwargs.pop("num_clips", 0)
        self.validated_hr = kwargs.pop("validated_hr", 0.0)
        self.total_hr = kwargs.pop("total_hr", 0.0)
        self.size_bytes = kwargs.pop("size_bytes", 0)
        description = (
            f"Common Voice speech-to-text dataset in {self.language or name}. "
            f"The dataset comprises {self.validated_hr} hours of validated "
            f"transcribed speech from {self.num_clips} recordings.")
        super().__init__(name=name,
                         version=datasets.Version(version),
                         description=description, **kwargs)


class CommonVoice(datasets.GeneratorBasedBuilder):
    DEFAULT_WRITER_BATCH_SIZE = 1000

    BUILDER_CONFIGS = [
        CommonVoiceConfig(
            name=lang,
            version=STATS["version"],
            language=lang,
            release_date=STATS["date"],
            num_clips=lang_stats.get("clips", 0),
            validated_hr=float(lang_stats.get("validHrs") or 0),
            total_hr=float(lang_stats.get("totalHrs") or 0),
            size_bytes=int(lang_stats.get("size") or 0),
        )
        for lang, lang_stats in STATS["locales"].items()
    ]

    def _info(self):
        total_languages = len(STATS["locales"])
        total_valid_hours = STATS["totalValidHrs"]
        description = (
            "Common Voice is Mozilla's initiative to help teach machines how "
            f"real people speak. The dataset currently consists of "
            f"{total_valid_hours} validated hours of speech in "
            f"{total_languages} languages, but more voices and languages are "
            "always added.")
        return datasets.DatasetInfo(
            description=description,
            features=datasets.Features({
                "client_id": datasets.Value("string"),
                "path": datasets.Value("string"),
                "audio": datasets.features.Audio(sampling_rate=48_000),
                "sentence": datasets.Value("string"),
                "up_votes": datasets.Value("int64"),
                "down_votes": datasets.Value("int64"),
                "age": datasets.Value("string"),
                "gender": datasets.Value("string"),
                "accent": datasets.Value("string"),
                "locale": datasets.Value("string"),
                "segment": datasets.Value("string"),
            }),
            supervised_keys=None,
            homepage=_HOMEPAGE,
            license=_LICENSE,
            citation=_CITATION,
            version=self.config.version,
        )

    def _get_bundle_url(self, locale, url_template):
        import requests

        path = url_template.replace("{locale}", locale)
        path = urllib.parse.quote(path.encode("utf-8"), safe="~()*!.'")
        response = requests.get(f"{_API_URL}/bucket/dataset/{path}",
                                timeout=10.0).json()
        return response["url"]

    def _log_download(self, locale, bundle_version, auth_token):
        import requests
        from huggingface_hub import HfApi

        whoami = HfApi().whoami(auth_token)
        email = whoami.get("email", "")
        payload = {"email": email, "locale": locale, "dataset": bundle_version}
        requests.post(f"{_API_URL}/{locale}/downloaders", json=payload).json()

    def _split_generators(self, dl_manager):
        from huggingface_hub import HfFolder

        cfg = dl_manager.download_config
        hf_auth_token = getattr(cfg, "token", None) or \
            getattr(cfg, "use_auth_token", None) or HfFolder().get_token()
        if hf_auth_token is None:
            raise EnvironmentError(
                "Token is required to load this dataset. Pass a token by "
                "logging in with `huggingface-cli login` or via `token=`.")

        bundle_url_template = STATS["bundleURLTemplate"]
        bundle_version = bundle_url_template.split("/")[0]
        self._log_download(self.config.name, bundle_version, hf_auth_token)
        archive_path = dl_manager.download(
            self._get_bundle_url(self.config.name, bundle_url_template))
        local_extracted = (dl_manager.extract(archive_path)
                           if not dl_manager.is_streaming else None)

        if self.config.version < datasets.Version("5.0.0"):
            path_to_data = ""
        else:
            path_to_data = "/".join([bundle_version, self.config.name])
        path_to_clips = "/".join([path_to_data, "clips"]) if path_to_data \
            else "clips"

        return [
            datasets.SplitGenerator(
                name=name,
                gen_kwargs={
                    "local_extracted_archive": local_extracted,
                    "archive_iterator": dl_manager.iter_archive(archive_path),
                    "metadata_filepath": "/".join([path_to_data, tsv])
                    if path_to_data else tsv,
                    "path_to_clips": path_to_clips,
                },
            )
            for name, tsv in _SPLIT_TSVS
        ]

    def _generate_examples(self, local_extracted_archive, archive_iterator,
                           metadata_filepath, path_to_clips):
        data_fields = list(self._info().features.keys())
        metadata = {}
        metadata_found = False
        for path, f in archive_iterator:
            if path == metadata_filepath:
                metadata_found = True
                lines = (line.decode("utf-8") for line in f)
                reader = csv.DictReader(lines, delimiter="\t",
                                        quoting=csv.QUOTE_NONE)
                for row in reader:
                    if not row["path"].endswith(".mp3"):
                        row["path"] += ".mp3"
                    row["path"] = os.path.join(path_to_clips, row["path"])
                    if "accents" in row:            # CV >= 8.0 renamed column
                        row["accent"] = row.pop("accents")
                    for field in data_fields:
                        row.setdefault(field, "")
                    metadata[row["path"]] = row
            elif path.startswith(path_to_clips):
                assert metadata_found, \
                    "Found audio clips before the metadata TSV file."
                if not metadata:
                    break
                if path in metadata:
                    result = dict(metadata[path])
                    full = (os.path.join(local_extracted_archive, path)
                            if local_extracted_archive else path)
                    result["audio"] = {"path": full, "bytes": f.read()}
                    result["path"] = full if local_extracted_archive else None
                    yield path, result
