# coding=utf-8
"""LibriSpeech ASR dataset builder (HF `datasets` script).

Rebuild of the reference's builder (reference librispeech_asr.py:46-300 —
R18 in SURVEY.md §2.1) with the same config names, split names, feature
schema, and example semantics: openslr.org tarballs, one example per
utterance, audio bytes streamed from the archive with the extracted local
.flac path attached when available. Restructured table-driven (the reference
hand-writes each config's SplitGenerator list)."""

import os

import datasets

_CITATION = """\
@inproceedings{panayotov2015librispeech,
  title={Librispeech: an ASR corpus based on public domain audio books},
  author={Panayotov, Vassil and Chen, Guoguo and Povey, Daniel and Khudanpur, Sanjeev},
  booktitle={Acoustics, Speech and Signal Processing (ICASSP), 2015 IEEE International Conference on},
  pages={5206--5210},
  year={2015},
  organization={IEEE}
}
"""

_DESCRIPTION = """\
LibriSpeech is a corpus of approximately 1000 hours of read English speech,
derived from audiobooks from the LibriVox project, sampled at 16 kHz.
"""

_URL = "http://www.openslr.org/12"
_DL_URL = "http://www.openslr.org/resources/12/"

_ARCHIVES = {
    "dev.clean": "dev-clean.tar.gz",
    "dev.other": "dev-other.tar.gz",
    "test.clean": "test-clean.tar.gz",
    "test.other": "test-other.tar.gz",
    "train.clean.100": "train-clean-100.tar.gz",
    "train.clean.360": "train-clean-360.tar.gz",
    "train.other.500": "train-other-500.tar.gz",
}

# config -> ordered split list (reference _DL_URLS table + split-generator
# blocks, librispeech_asr.py:46-79, 133-260)
_CONFIG_SPLITS = {
    "train_100": ["train.clean.100", "dev.clean", "dev.other",
                  "test.clean", "test.other"],
    "for_experiments": ["dev.clean", "test.clean", "test.other"],
    "clean": ["train.clean.100", "train.clean.360", "dev", "test"],
    "other": ["train.other.500", "dev", "test"],
    "all": ["train.clean.100", "train.clean.360", "train.other.500",
            "dev.clean", "dev.other", "test.clean", "test.other"],
}

# for the short-name configs, split name -> archive key
_SPLIT_ARCHIVE = {
    ("clean", "dev"): "dev.clean", ("clean", "test"): "test.clean",
    ("other", "dev"): "dev.other", ("other", "test"): "test.other",
}


class LibrispeechASRConfig(datasets.BuilderConfig):
    def __init__(self, **kwargs):
        super().__init__(version=datasets.Version("2.1.0", ""), **kwargs)


class LibrispeechASR(datasets.GeneratorBasedBuilder):
    """LibriSpeech dataset builder."""

    DEFAULT_WRITER_BATCH_SIZE = 256
    DEFAULT_CONFIG_NAME = "all"
    BUILDER_CONFIGS = [
        LibrispeechASRConfig(name="train_100",
                             description="train-clean-100 + dev/test clean+other"),
        LibrispeechASRConfig(name="for_experiments",
                             description="small dev/test-only config for experiments"),
        LibrispeechASRConfig(name="clean", description="'Clean' speech."),
        LibrispeechASRConfig(name="other",
                             description="'Other', more challenging, speech."),
        LibrispeechASRConfig(name="all", description="Combined clean and other."),
    ]

    def _info(self):
        return datasets.DatasetInfo(
            description=_DESCRIPTION,
            features=datasets.Features({
                "file": datasets.Value("string"),
                "audio": datasets.Audio(sampling_rate=16_000),
                "text": datasets.Value("string"),
                "speaker_id": datasets.Value("int64"),
                "chapter_id": datasets.Value("int64"),
                "id": datasets.Value("string"),
            }),
            supervised_keys=("file", "text"),
            homepage=_URL,
            citation=_CITATION,
        )

    def _archive_key(self, split: str) -> str:
        return _SPLIT_ARCHIVE.get((self.config.name, split), split)

    def _split_generators(self, dl_manager):
        splits = _CONFIG_SPLITS[self.config.name]
        urls = {s: _DL_URL + _ARCHIVES[self._archive_key(s)] for s in splits}
        archive_path = dl_manager.download(urls)
        local_extracted = (dl_manager.extract(archive_path)
                           if not dl_manager.is_streaming else {})
        return [
            datasets.SplitGenerator(
                name=split,
                gen_kwargs={
                    "local_extracted_archive": local_extracted.get(split),
                    "files": dl_manager.iter_archive(archive_path[split]),
                },
            )
            for split in splits
        ]

    def _generate_examples(self, files, local_extracted_archive):
        """One example per utterance: .flac bytes + .trans.txt transcript.

        LibriSpeech archives store each chapter's flacs before its
        N-utterance .trans.txt, so flushing whenever counts line up keeps
        memory bounded (same strategy as the reference :264-300)."""
        key = 0
        audio_data = {}
        transcripts = []
        for path, f in files:
            if path.endswith(".flac"):
                utt_id = path.split("/")[-1][: -len(".flac")]
                audio_data[utt_id] = f.read()
            elif path.endswith(".trans.txt"):
                for line in f:
                    line = line.decode("utf-8").strip()
                    if not line:
                        continue
                    utt_id, transcript = line.split(" ", 1)
                    speaker_id, chapter_id = (int(el) for el in
                                              utt_id.split("-")[:2])
                    audio_file = f"{utt_id}.flac"
                    if local_extracted_archive:
                        audio_file = os.path.join(local_extracted_archive,
                                                  audio_file)
                    transcripts.append({
                        "id": utt_id,
                        "speaker_id": speaker_id,
                        "chapter_id": chapter_id,
                        "file": audio_file,
                        "text": transcript,
                    })
            if audio_data and len(audio_data) == len(transcripts):
                for transcript in transcripts:
                    audio = {"path": transcript["file"],
                             "bytes": audio_data[transcript["id"]]}
                    yield key, {"audio": audio, **transcript}
                    key += 1
                audio_data = {}
                transcripts = []
