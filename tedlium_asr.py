# coding=utf-8
"""TED-LIUM ASR dataset builder (HF `datasets` script).

Rebuild of the reference builder (reference tedlium_asr.py:29-371 — R18 in
SURVEY.md §2.1): releases 1/2/3 (+ release3 speaker-adaptation), NIST sphere
audio segmented by .stm transcripts, gender parsed from the stm label,
"ignore_time_segment_in_scoring" suffix trimmed. Audio decode uses this
framework's host IO (the image has no soundfile); streaming-mode sph decode
is a minimal NIST-SPHERE PCM16 reader."""

import os
import re
from collections import defaultdict
from io import BytesIO
from pathlib import Path

import datasets
import numpy as np

_LICENSE = "licensed under Creative Commons BY-NC-ND 3.0"
_DL_URL = "https://huggingface.co/datasets/LIUM/tedlium/resolve/main/"

_CITATION_R1 = """\
@inproceedings{rousseau2012tedlium,
  title={TED-LIUM: an Automatic Speech Recognition dedicated corpus},
  author={Rousseau, Anthony and Del{\\'e}glise, Paul and Est{\\`e}ve, Yannick},
  booktitle={LREC},
  pages={125--129},
  year={2012}
}
"""
_CITATION_R2 = """\
@inproceedings{rousseau2014enhancing,
  title={Enhancing the TED-LIUM corpus with selected data for language modeling and more TED talks},
  author={Rousseau, Anthony and Del{\\'e}glise, Paul and Est{\\`e}ve, Yannick},
  booktitle={LREC},
  pages={3935--3939},
  year={2014}
}
"""
_CITATION_R3 = """\
@inproceedings{hernandez2018ted,
  title={TED-LIUM 3: twice as much data and corpus repartition for experiments on speaker adaptation},
  author={Hernandez, Fran{\\c{c}}ois and Nguyen, Vincent and Ghannay, Sahar and Tomashenko, Natalia and Est{\\`e}ve, Yannick},
  booktitle={SPECOM},
  pages={198--208},
  year={2018}
}
"""


class TedliumReleaseConfig(datasets.BuilderConfig):
    def __init__(self, *, url, download_urls, split_paths, citation, **kwargs):
        super().__init__(version=datasets.Version("1.0.1"), **kwargs)
        self.url = url
        self.download_urls = download_urls
        self.split_paths = split_paths
        self.citation = citation


def _release_config(name, citation, description, prefix, train_shards):
    return TedliumReleaseConfig(
        name=name,
        description=description,
        citation=citation,
        url="https://www.openslr.org/7/" if name == "release1"
        else "https://www.openslr.org/19/" if name == "release2"
        else "https://www.openslr.org/51/",
        download_urls={
            "train": [_DL_URL + os.path.join(prefix, shard)
                      for shard in train_shards],
            "validation": [_DL_URL + os.path.join(prefix, "dev.tar.gz")],
            "test": [_DL_URL + os.path.join(prefix, "test.tar.gz")],
        },
        split_paths=[
            (datasets.Split.TRAIN, os.path.join("TEDLIUM_release1", "train")
             if name == "release1" else "train"),
            (datasets.Split.VALIDATION, os.path.join("TEDLIUM_release1", "dev")
             if name == "release1" else "dev"),
            (datasets.Split.TEST, os.path.join("TEDLIUM_release1", "test")
             if name == "release1" else "test"),
        ],
    )


def _make_builder_configs():
    return [
        _release_config("release1", _CITATION_R1,
                        "TED-LIUM corpus release 1 (118 hours, 774 talks).",
                        "TEDLIUM_release1", ["train.tar.gz"]),
        _release_config("release2", _CITATION_R2,
                        "TED-LIUM corpus release 2 (207 hours, 1495 talks).",
                        "TEDLIUM_release2", ["train_1.tar.gz", "train_2.tar.gz"]),
        _release_config("release3", _CITATION_R3,
                        "TED-LIUM corpus release 3 (452 hours, 2351 talks; "
                        "legacy repartition).",
                        os.path.join("TEDLIUM_release3", "legacy"),
                        ["train_1.tar.gz", "train_2.tar.gz"]),
        _release_config("release3-speaker-adaptation", _CITATION_R3,
                        "TED-LIUM release 3 speaker-adaptation repartition.",
                        os.path.join("TEDLIUM_release3", "speaker-adaptation"),
                        ["train_1.tar.gz", "train_2.tar.gz"]),
    ]


def _maybe_trim_suffix(transcript: str) -> str:
    # stm lines may end with "ignore_time_segment_in_scoring"
    return re.sub(r"\s*ignore_time_segment_in_scoring\s*$", "",
                  transcript).strip()


def _parse_gender(label: str) -> str:
    """stm label like '<o,f0,female>' -> ClassLabel name."""
    m = re.search(r"(male|female)", label or "")
    return m.group(1) if m else "unknown"


def _extract_audio_segment(segment: np.ndarray, sampling_rate: int,
                           start: float, end: float) -> np.ndarray:
    return segment[int(start * sampling_rate): int(end * sampling_rate)]


def _read_sph(data_or_path):
    """NIST SPHERE PCM16 reader -> (int16 samples, sample_rate).

    Replaces the reference's soundfile dependency (absent in this image).
    """
    if isinstance(data_or_path, (str, os.PathLike)):
        raw = Path(data_or_path).read_bytes()
    else:
        raw = data_or_path.read()
    if not raw.startswith(b"NIST_1A"):
        raise ValueError("not a NIST SPHERE file")
    header_size = int(raw[8:16].decode().strip())
    header = raw[:header_size].decode("latin-1")
    fields = dict(re.findall(r"^(\S+) -[is]\d* (\S+)$", header, re.M))
    rate = int(fields.get("sample_rate", 16000))
    data = raw[header_size:]
    samples = np.frombuffer(data, dtype="<i2")
    n_channels = int(fields.get("channel_count", 1))
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1).astype(np.int16)
    return samples, rate


class TedLium(datasets.GeneratorBasedBuilder):
    """TED-LIUM dataset: audio recordings of TED talks with transcripts."""

    BUILDER_CONFIGS = _make_builder_configs()

    def _info(self):
        return datasets.DatasetInfo(
            description=self.config.description,
            features=datasets.Features({
                "audio": datasets.features.Audio(sampling_rate=16_000),
                "text": datasets.Value("string"),
                "speaker_id": datasets.Value("string"),
                "gender": datasets.features.ClassLabel(
                    names=["unknown", "female", "male"]),
                "file": datasets.Value("string"),
                "id": datasets.Value("string"),
            }),
            supervised_keys=("audio", "text"),
            homepage=self.config.url,
            license=_LICENSE,
            citation=self.config.citation,
        )

    def _split_generators(self, dl_manager):
        archive_path = dl_manager.download(self.config.download_urls)
        local_extracted = (dl_manager.extract(archive_path)
                           if not dl_manager.is_streaming else {})
        splits = []
        for split, path in self.config.split_paths:
            splits.append(datasets.SplitGenerator(
                name=split,
                gen_kwargs={
                    "filepath": [dl_manager.iter_archive(p)
                                 for p in archive_path[split]],
                    "local_extracted_archive": local_extracted.get(split),
                    "split_path": path,
                }))
        return splits

    def _yield_stm_segments(self, stm_file, lines, audio_file, segment,
                            sampling_rate):
        for line in lines:
            line = line.strip()
            if not line:
                continue
            fn, channel, speaker, start, end, label, transcript = \
                line.split(" ", 6)
            transcript = _maybe_trim_suffix(transcript)
            samples = _extract_audio_segment(segment, sampling_rate,
                                             float(start), float(end))
            key = "-".join([speaker, start, end, label])
            yield key, {
                "audio": {"path": audio_file, "array": samples,
                          "sampling_rate": sampling_rate},
                "text": transcript,
                "speaker_id": speaker,
                "gender": _parse_gender(label),
                "file": audio_file,
                "id": key,
            }

    def _generate_examples(self, filepath, local_extracted_archive,
                           split_path):
        if local_extracted_archive:
            for local_archive in local_extracted_archive:
                split_dir = os.path.join(local_archive, split_path)
                stm_dir = os.path.join(split_dir, "stm")
                sph_dir = os.path.join(split_dir, "sph")
                if not os.path.isdir(stm_dir):
                    stm_dir = sph_dir = split_dir
                for fname in sorted(os.listdir(stm_dir)):
                    if not fname.endswith(".stm"):
                        continue
                    stem = Path(fname).stem
                    audio_file = os.path.join(sph_dir, stem + ".sph")
                    segment, rate = _read_sph(audio_file)
                    with open(os.path.join(stm_dir, fname)) as f:
                        yield from self._yield_stm_segments(
                            fname, f, audio_file, segment, rate)
        else:
            # streaming: pair sph bytes with stm transcripts per talk
            audio_data = {}
            transcripts = defaultdict(list)
            for archive in filepath:
                for path, f in archive:
                    if path.endswith(".sph"):
                        fn = Path(path).stem
                        audio_data[fn] = _read_sph(BytesIO(f.read()))
                    elif path.endswith(".stm"):
                        for line in f:
                            line = line.decode("utf-8").strip()
                            if not line:
                                continue
                            fn, channel, speaker, start, end, label, text = \
                                line.split(" ", 6)
                            transcripts[fn].append(
                                (speaker, start, end, label,
                                 _maybe_trim_suffix(text),
                                 path.replace("stm", "sph")))
                    if audio_data and audio_data.keys() == transcripts.keys():
                        for fn, segs in transcripts.items():
                            segment, rate = audio_data[fn]
                            for speaker, start, end, label, text, afile in segs:
                                samples = _extract_audio_segment(
                                    segment, rate, float(start), float(end))
                                key = "-".join([speaker, start, end, label])
                                yield key, {
                                    "audio": {"path": afile, "array": samples,
                                              "sampling_rate": rate},
                                    "text": text,
                                    "speaker_id": speaker,
                                    "gender": _parse_gender(label),
                                    "file": afile,
                                    "id": key,
                                }
                        audio_data = {}
                        transcripts = defaultdict(list)
