# coding=utf-8
"""GigaSpeech dataset builder (HF `datasets` script).

Rebuild of the reference builder (reference gigaspeech.py:120-386 — R18 in
SURVEY.md §2.1): training subsets xs/s/m/l/xl are NESTED supersets (config
"m" downloads xs+s+m shard sets; the non-xs subsets live under *_additional
paths), dev/test configs fetch both eval splits (the reference's OOD tweak at
gigaspeech.py:214), audio ships as sharded tar archives with per-shard
metadata CSVs keyed by segment id."""

import csv
import os

import datasets

_CITATION = """\
@article{GigaSpeech2021,
  title={GigaSpeech: An Evolving, Multi-domain ASR Corpus with 10,000 Hours of Transcribed Audio},
  author={Guoguo Chen and Shuzhou Chai and Guanbo Wang and Jiayu Du and Wei-Qiang Zhang and Chao Weng and Dan Su and Daniel Povey and Jan Trmal and Junbo Zhang and Mingjie Jin and Sanjeev Khudanpur and Shinji Watanabe and Shuaijiang Zhao and Wei Zou and Xiangang Li and Xuchen Yao and Yongqing Wang and Yujun Wang and Zhao You and Zhiyong Yan},
  journal={arXiv preprint arXiv:2106.06909},
  year={2021}
}
"""

_DESCRIPTION = """\
GigaSpeech is an evolving, multi-domain English speech recognition corpus
with 10,000 hours of high quality labeled audio. Training subsets of 10h
(xs), 250h (s), 1000h (m), 2500h (l) and 10000h (xl) are provided; DEV and
TEST are re-transcribed by professional human transcribers.
"""

_HOMEPAGE = "https://github.com/SpeechColab/GigaSpeech"
_LICENSE = "Apache License 2.0"

_CATEGORIES = (
    "People  and  Blogs", "Business", "Nonprofits  and  Activism", "Crime",
    "History", "Pets  and  Animals", "News and Politics", "Travel and Events",
    "Kids and Family", "Leisure", "N/A", "Comedy", "News  and  Politics",
    "Sports", "Arts", "Science  and  Technology", "Autos  and  Vehicles",
    "Science and Technology", "People and Blogs", "Music",
    "Society and Culture", "Education", "Howto  and  Style",
    "Film  and  Animation", "Gaming", "Entertainment", "Travel  and  Events",
    "Health and Fitness", "audiobook",
)
_SOURCES = ("audiobook", "podcast", "youtube")
_SUBSETS = ("xs", "s", "m", "l", "xl")

_BASE_DATA_URL = "https://huggingface.co/datasets/speechcolab/gigaspeech/resolve/main/data/"
_AUDIO_ARCHIVE_URL = _BASE_DATA_URL + \
    "audio/{subset}_files{is_additional}/{subset}_chunks_{archive_id:04}.tar.gz"
_META_URL = _BASE_DATA_URL + \
    "metadata/{subset}_metadata{is_additional}/{subset}_chunks_{archive_id:04}_metadata.csv"
_N_ARCHIVES_URL = _BASE_DATA_URL + "{subset}_n_archives{is_additional}.txt"


def _flatten_nested_dict(nested):
    return {key: [el for inner in value.values() for el in inner]
            for key, value in nested.items()}


class GigaspeechConfig(datasets.BuilderConfig):
    def __init__(self, name, *args, **kwargs):
        super().__init__(name=name, *args, **kwargs)
        # nested supersets: "m" == xs + s + m (reference gigaspeech.py:139-147)
        self.subsets_to_download = (
            _SUBSETS[: _SUBSETS.index(name) + 1] if name in _SUBSETS
            else (name,))


class Gigaspeech(datasets.GeneratorBasedBuilder):
    """GigaSpeech dataset builder."""

    VERSION = datasets.Version("1.0.0")
    BUILDER_CONFIGS = [GigaspeechConfig(name=subset)
                       for subset in _SUBSETS + ("dev", "test")]
    DEFAULT_WRITER_BATCH_SIZE = 128

    def _info(self):
        return datasets.DatasetInfo(
            description=_DESCRIPTION,
            features=datasets.Features({
                "segment_id": datasets.Value("string"),
                "speaker": datasets.Value("string"),
                "text": datasets.Value("string"),
                "audio": datasets.Audio(sampling_rate=16_000),
                "begin_time": datasets.Value("float32"),
                "end_time": datasets.Value("float32"),
                "audio_id": datasets.Value("string"),
                "title": datasets.Value("string"),
                "url": datasets.Value("string"),
                "source": datasets.ClassLabel(names=_SOURCES),
                "category": datasets.ClassLabel(names=_CATEGORIES),
                "original_full_path": datasets.Value("string"),
            }),
            homepage=_HOMEPAGE,
            license=_LICENSE,
            citation=_CITATION,
        )

    @staticmethod
    def _is_additional_data(name):
        return "_additional" if name in {"s", "m", "l", "xl"} else ""

    @property
    def _splits_to_subsets(self):
        return {"train": self.config.subsets_to_download,
                "dev": ["dev"], "test": ["test"]}

    @staticmethod
    def _read_n_archives(path):
        with open(path, encoding="utf-8") as f:
            return int(f.read().strip())

    def _split_generators(self, dl_manager):
        splits_to_subsets = self._splits_to_subsets
        # eval-only configs fetch BOTH eval splits (reference OOD tweak :214)
        splits = (("dev", "test") if self.config.name in {"dev", "test"}
                  else ("train", "dev", "test"))

        def per_split(url_fn):
            return {split: {subset: url_fn(subset)
                            for subset in splits_to_subsets[split]}
                    for split in splits}

        n_archives_paths = dl_manager.download_and_extract(per_split(
            lambda s: _N_ARCHIVES_URL.format(
                subset=s, is_additional=self._is_additional_data(s))))
        n_archives = {split: {s: self._read_n_archives(n_archives_paths[split][s])
                              for s in splits_to_subsets[split]}
                      for split in splits}

        audio_urls = {split: {s: [
            _AUDIO_ARCHIVE_URL.format(subset=s,
                                      is_additional=self._is_additional_data(s),
                                      archive_id=i)
            for i in range(n_archives[split][s])]
            for s in splits_to_subsets[split]} for split in splits}
        audio_paths = _flatten_nested_dict(dl_manager.download(audio_urls))
        local_audio = (dl_manager.extract(audio_paths)
                       if not dl_manager.is_streaming else None)

        meta_urls = {split: {s: [
            _META_URL.format(subset=s,
                             is_additional=self._is_additional_data(s),
                             archive_id=i)
            for i in range(n_archives[split][s])]
            for s in splits_to_subsets[split]} for split in splits}
        meta_paths = _flatten_nested_dict(
            dl_manager.download_and_extract(meta_urls))

        def gen(split, name):
            return datasets.SplitGenerator(
                name=name,
                gen_kwargs={
                    "audio_archives_iterators": [
                        dl_manager.iter_archive(p) for p in audio_paths[split]],
                    "local_audio_archives_paths":
                        local_audio[split] if local_audio else None,
                    "meta_paths": meta_paths[split],
                })

        out = []
        if self.config.name not in {"dev", "test"}:
            out.append(gen("train", datasets.Split.TRAIN))
        out.append(gen("dev", datasets.Split.VALIDATION))
        out.append(gen("test", datasets.Split.TEST))
        return out

    def _generate_examples(self, audio_archives_iterators,
                           local_audio_archives_paths, meta_paths):
        assert len(audio_archives_iterators) == len(meta_paths)
        for i, (meta_path, archive_it) in enumerate(
                zip(meta_paths, audio_archives_iterators)):
            meta = {}
            with open(meta_path) as csvfile:
                for line in csv.DictReader(csvfile):
                    meta[line["sid"]] = line
            for audio_path_in_archive, audio_file in archive_it:
                audio_id = os.path.split(audio_path_in_archive)[1].split(
                    ".wav")[0]
                m = dict(meta[audio_id])
                m["segment_id"] = m.pop("sid")
                m["original_full_path"] = m.pop("path")
                m["text"] = m.pop("text_tn")
                m["audio_id"] = m.pop("aid")
                if not m.get("category"):
                    m["category"] = "N/A"
                path = (os.path.join(local_audio_archives_paths[i],
                                     audio_path_in_archive)
                        if local_audio_archives_paths else audio_path_in_archive)
                yield audio_id, {
                    "audio": {"path": path, "bytes": audio_file.read()},
                    **{k: v for k, v in m.items() if k in self.info.features},
                }
