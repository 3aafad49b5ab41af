"""Dataset loaders (L0 data plane).

HotpotQA JSON/JSONL loader with index/count slicing + a registry for future
sources, mirroring /root/reference/app/core/dataset_loader.py:6-59. Adds a
deterministic synthetic HotpotQA-style generator used by tests and benches
when no real dataset file is present (the environment has no network).
"""
from __future__ import annotations

import hashlib
import json
import random
from pathlib import Path
from typing import Any, Dict, List


class DatasetLoader:
    """Extensible dataset loader base."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg

    def load(self) -> List[Dict[str, Any]]:
        raise NotImplementedError


class HotpotQALoader(DatasetLoader):
    """Load HotpotQA samples from a JSON array or JSON-Lines file."""

    def load(self) -> List[Dict[str, Any]]:
        path = Path(self.cfg["path"])
        index = int(self.cfg.get("index", 0))
        count = int(self.cfg.get("count", 1))

        if not path.exists():
            raise FileNotFoundError(f"HotpotQA dataset not found at {path}")

        with open(path, "r", encoding="utf-8") as f:
            first_char = f.read(1)
            f.seek(0)
            if first_char == "[":
                data = json.load(f)
            else:
                data = [json.loads(line) for line in f if line.strip()]

        if count == -1:
            return data[index:]
        return data[index : index + count]


class SyntheticHotpotQALoader(DatasetLoader):
    """Deterministic synthetic multi-hop QA corpus.

    Generates samples with the HotpotQA schema:
      {"_id", "question", "answer", "type", "level",
       "context": [[title, [sent, ...]], ...],
       "supporting_facts": [[title, sent_id], ...]}

    Each sample encodes a 2-hop chain: entity A relates to bridge entity B in
    one document, and B relates to the answer C in another document, with
    distractor documents alongside — so Recall@k and multi-hop expansion are
    meaningfully exercised without network access.
    """

    FIRST = ["Alden", "Brisa", "Corin", "Dara", "Evren", "Fenn", "Gale",
             "Harlow", "Iris", "Jorah", "Kael", "Lior", "Mira", "Noor",
             "Orrin", "Pasha", "Quill", "Rowan", "Sage", "Tove"]
    LAST = ["Ashford", "Blackwood", "Caldwell", "Draven", "Ellsworth",
            "Fairbairn", "Greenfield", "Hawthorne", "Ingram", "Jessop",
            "Kingsley", "Lockhart", "Marchbanks", "Northcote", "Oakden",
            "Pemberton", "Quincey", "Ravenscroft", "Silverton", "Thackeray"]
    CITY = ["Veldoria", "Westmarch", "Xanthia", "Yarrowdale", "Zephyr Bay",
            "Amberfield", "Briarcliff", "Cinderfall", "Dunmore", "Eastvale",
            "Foxglove", "Gildenport", "Hollowbrook", "Ironridge", "Junewood",
            "Kestrel Point", "Larkspur", "Mistral Hollow", "Nightfen", "Oakhaven"]
    PROFESSION = ["architect", "botanist", "cartographer", "drummer",
                  "engineer", "falconer", "glassblower", "historian",
                  "illustrator", "jeweler", "kayaker", "librarian",
                  "mathematician", "novelist", "organist", "photographer"]

    SYLLABLES = ["an", "bel", "cor", "dra", "el", "fen", "gar", "hol", "in",
                 "jor", "kel", "lor", "mar", "nor", "or", "pel", "quin",
                 "rav", "sel", "tor", "ul", "ven", "wyn", "xan", "yor", "zel"]

    def __init__(self, cfg: Dict[str, Any]):
        super().__init__(cfg)
        self.n = int(cfg.get("count", 64) if cfg.get("count", 64) != -1 else 64)
        self.index = int(cfg.get("index", 0))
        self.seed = int(cfg.get("seed", 0))
        self.n_distractors = int(cfg.get("n_distractors", 8))
        # unique_entities: syllable-synthesized surnames keyed by a global
        # counter, so large corpora don't collapse under (title, sent_id)
        # dedup (the 20x20 name pools collide past ~400 docs)
        self.unique_entities = bool(cfg.get("unique_entities", False))
        self._name_counter = 0

    def _synth_surname(self, idx: int) -> str:
        s = self.SYLLABLES
        parts = [s[idx % len(s)], s[(idx // len(s)) % len(s)],
                 s[(idx // (len(s) ** 2)) % len(s)]]
        return "".join(parts).capitalize()

    def _person(self, rng: random.Random) -> str:
        if self.unique_entities:
            self._name_counter += 1
            return f"{rng.choice(self.FIRST)} {self._synth_surname(self._name_counter)}"
        return f"{rng.choice(self.FIRST)} {rng.choice(self.LAST)}"

    def _make_sample(self, i: int) -> Dict[str, Any]:
        rng = random.Random(f"{self.seed}:{i}")
        a = self._person(rng)
        b = self._person(rng)
        city = rng.choice(self.CITY)
        prof = rng.choice(self.PROFESSION)

        doc1_title = f"{a}"
        doc1_sents = [
            f"{a} was a {rng.choice(self.PROFESSION)} known for early work.",
            f"{a} collaborated closely with {b} for over a decade.",
            f"Later in life {a} retired from public view.",
        ]
        doc2_title = f"{b}"
        doc2_sents = [
            f"{b} was born in {city}.",
            f"{b} worked as a {prof} before turning to teaching.",
            f"{b} published several essays on local history.",
        ]
        context = [[doc1_title, doc1_sents], [doc2_title, doc2_sents]]
        for d in range(self.n_distractors):
            drng = random.Random(f"{self.seed}:{i}:d{d}")
            p = self._person(drng)
            c = drng.choice(self.CITY)
            context.append(
                [
                    f"{p}",
                    [
                        f"{p} was born in {c}.",
                        f"{p} spent years as a {drng.choice(self.PROFESSION)}.",
                    ],
                ]
            )
        rng.shuffle(context)

        question = f"In which city was the collaborator of {a} born?"
        sample_id = hashlib.sha1(f"{self.seed}:{i}".encode()).hexdigest()[:24]
        return {
            "_id": sample_id,
            "question": question,
            "answer": city,
            "type": "bridge",
            "level": "medium",
            "context": context,
            "supporting_facts": [[doc1_title, 1], [doc2_title, 0]],
        }

    def load(self) -> List[Dict[str, Any]]:
        return [self._make_sample(i) for i in range(self.index, self.index + self.n)]


DATASET_REGISTRY = {
    "hotpotqa": HotpotQALoader,
    "synthetic_hotpotqa": SyntheticHotpotQALoader,
}


def build_dataset_loader(cfg: Dict[str, Any]) -> DatasetLoader:
    ds_type = cfg.get("type")
    if ds_type not in DATASET_REGISTRY:
        raise ValueError(f"Unknown dataset type: {ds_type!r} (known: {sorted(DATASET_REGISTRY)})")
    return DATASET_REGISTRY[ds_type](cfg)
