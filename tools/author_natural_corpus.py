"""Assemble the hand-authored natural corpus into the real HotpotQA schema.

Takes the chains in tools/natural_corpus_data.py (hand-written sentences
about real-world entities — see that module's docstring) and emits
`data/natural/natural_hotpotqa.json`, one sample per (chain, question
phrasing) in exactly the reference loader's schema
(/root/reference/my_code/ingest_hotpotqa.py:46-87): _id, question, answer,
type, level, supporting_facts [[title, sid], ...], context [[title,
[sentences]], ...]. Each sample's context carries the two gold documents
plus `n_distractors` documents sampled (seeded, deterministic) from the
OTHER chains — the standard HotpotQA distractor setting.

The output is committed to git: it is authored content, not a generated
artifact.

  python tools/author_natural_corpus.py [--n_distractors 8] [--seed 0]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from natural_corpus_data import CHAINS  # noqa: E402

try:
    from natural_corpus_data2 import DISTRACTOR_DOCS  # noqa: E402
    from natural_corpus_data2 import EXTENSIONS, NEW_CHAINS
except ImportError:  # pre-extension checkouts
    EXTENSIONS, NEW_CHAINS, DISTRACTOR_DOCS = {}, [], {}

try:
    from natural_corpus_data3 import EXTRA_QUESTIONS  # noqa: E402
except ImportError:
    EXTRA_QUESTIONS = {}


def _person_sents(person: str, base) -> list:
    ext = EXTENSIONS.get(person, {})
    return list(base) + list(ext.get("extra_sents", []))


def _chain_for_question(person_chains, question: str):
    """A person can anchor several works (Hitchcock: Psycho AND Rear
    Window); an extension question attaches to the chain whose work the
    question actually names, falling back to the person's first chain."""
    for c in person_chains:
        main = c["work"].split(" (")[0]
        if main and main.lower() in question.lower():
            return c
    return person_chains[0]


def build_samples(n_distractors: int = 8, seed: int = 0):
    # global doc pool: title -> sentences (chains may share a person doc;
    # identical-by-construction, so last-write-wins is a no-op)
    all_chains = list(CHAINS) + list(NEW_CHAINS)
    pool = dict(DISTRACTOR_DOCS)
    by_person = {}
    for c in all_chains:
        pool[c["work"]] = list(c["work_sents"])
        pool[c["person"]] = _person_sents(c["person"], c["person_sents"])
        by_person.setdefault(c["person"], []).append(c)
    titles = sorted(pool)

    # (chain, question, answer, answer_sid) rows: base birthplace QA,
    # per-chain qa lists (new chains), and per-person extension qa
    rows = []
    for c in all_chains:
        if "answer" in c:
            for q in c["questions"]:
                rows.append((c, q, c["answer"], c["answer_sid"]))
        for qa in c.get("qa", []):
            for q in qa["questions"]:
                rows.append((c, q, qa["answer"], qa["answer_sid"]))
    for person, ext in EXTENSIONS.items():
        chains = by_person.get(person)
        if not chains:
            continue
        for qa in ext.get("qa", []):
            for q in qa["questions"]:
                rows.append((_chain_for_question(chains, q), q,
                             qa["answer"], qa["answer_sid"]))

    # family-keyed extra phrasings (natural_corpus_data3): each attaches
    # to the person's first qa of that family (base birthplace included)
    for person, fams in EXTRA_QUESTIONS.items():
        chains = by_person.get(person)
        if not chains:
            continue
        fam_qa = {}
        for c in chains:
            if "answer" in c:
                fam_qa.setdefault("birthplace",
                                  (c["answer"], c["answer_sid"]))
            for qa in c.get("qa", []):
                fam_qa.setdefault(qa.get("family"),
                                  (qa["answer"], qa["answer_sid"]))
        for qa in EXTENSIONS.get(person, {}).get("qa", []):
            fam_qa.setdefault(qa.get("family"),
                              (qa["answer"], qa["answer_sid"]))
        for fam, qs in fams.items():
            if fam not in fam_qa:
                continue
            answer, answer_sid = fam_qa[fam]
            for q in qs:
                rows.append((_chain_for_question(chains, q), q,
                             answer, answer_sid))

    rng = np.random.default_rng(seed)
    samples = []
    for ri, (c, q, answer, answer_sid) in enumerate(rows):
        gold_titles = {c["work"], c["person"]}
        others = [t for t in titles if t not in gold_titles]
        take = rng.permutation(len(others))[:n_distractors]
        ctx_titles = [c["work"], c["person"]] + [others[j] for j in take]
        order = rng.permutation(len(ctx_titles))
        context = [[ctx_titles[j], list(pool[ctx_titles[j]])]
                   for j in order]
        sid = hashlib.sha1(f"{ri}:{q}".encode()).hexdigest()[:24]
        samples.append({
            "_id": sid,
            "question": q,
            "answer": answer,
            "type": "bridge",
            "level": "medium",
            "supporting_facts": [[c["work"], c["link_sid"]],
                                 [c["person"], answer_sid]],
            "context": context,
        })
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_distractors", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "data" / "natural"
                                         / "natural_hotpotqa.json"))
    args = ap.parse_args()
    samples = build_samples(args.n_distractors, args.seed)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(samples, ensure_ascii=False, indent=1))
    n_docs = len({t for s in samples for t, _ in s["context"]})
    n_sents = len({(t, i) for s in samples for t, ss in s["context"]
                   for i in range(len(ss))})
    print(json.dumps({"samples": len(samples), "chains": len(CHAINS),
                      "unique_docs": n_docs, "unique_sentences": n_sents,
                      "out": str(out)}))


if __name__ == "__main__":
    main()
