"""Consistency lint for the hand-authored natural corpus.

Catches authoring mistakes before they become unanswerable questions:
  - link sentence must name the chain's person (or the work doc title);
  - answer must appear verbatim in the answer sentence;
  - the mock answerer's span extractor, run on the gold answer sentence
    with the chain's entities excluded, must return the gold answer —
    otherwise the question is structurally unanswerable for the offline
    pipeline and the row is flagged (the extractor is family-agnostic, so
    this is a property of the SENTENCE, not tuning to the corpus);
  - extension answer_sids must be in range; duplicate sentences across a
    person's base+extra doc are flagged.

  python tools/lint_natural_corpus.py
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
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

from a_modular_rag_framework_tpu.core.providers.mock_provider import (  # noqa: E402
    MockProvider,
)


def full_person_sents(person: str, base):
    ext = EXTENSIONS.get(person, {})
    return list(base) + list(ext.get("extra_sents", []))


def check_qa(person, work, link_sent, sents, qa, problems, seen_q):
    from a_modular_rag_framework_tpu.utils.textspan import capitalized_runs

    sid = qa["answer_sid"]
    if not (0 <= sid < len(sents)):
        problems.append(f"{person}: answer_sid {sid} out of range")
        return
    sent = sents[sid]
    ans = qa["answer"]
    if ans not in sent:
        problems.append(f"{person}: answer {ans!r} not in sentence {sid}: {sent!r}")
        return
    for q in qa["questions"]:
        if q in seen_q:
            problems.append(f"{person}: duplicate question {q!r}")
        seen_q.add(q)
        # mirror the runtime exclusion set (mock_provider._synthesize:
        # question entities + hop-1 runs + both doc titles)
        exclude = (capitalized_runs(q)
                   + [r for r in capitalized_runs(link_sent) if " " in r]
                   + [person, work])
        got = MockProvider._extract_span(q, sent, exclude=exclude)
        if got != ans:
            problems.append(
                f"{person}: extractor returned {got!r}, want {ans!r}\n"
                f"    q: {q}\n    s: {sent}")


def main() -> None:
    problems: list = []
    seen_q: set = set()
    fam: dict = {}
    persons = {}

    for c in CHAINS:
        persons.setdefault(c["person"], c)
    all_chains = list(CHAINS) + list(NEW_CHAINS)

    for c in all_chains:
        person, work = c["person"], c["work"]
        link = c["work_sents"][c["link_sid"]]
        lead = person.split(" (")[0]
        surname = lead.split()[-1]
        if lead not in link and surname not in link:
            problems.append(f"{work}: link sentence does not name {person!r}: {link!r}")
        sents = full_person_sents(person, c["person_sents"])
        if len(set(sents)) != len(sents):
            problems.append(f"{person}: duplicate sentences in person doc")
        base_qa = ([{"answer_sid": c["answer_sid"], "answer": c["answer"],
                     "questions": c["questions"]}]
                   if "answer" in c else [])
        for qa in base_qa + list(c.get("qa", [])):
            check_qa(person, work, link, sents, qa, problems, seen_q)

    for person, ext in EXTENSIONS.items():
        if person not in persons:
            problems.append(f"extension for unknown person {person!r}")
            continue
        c = persons[person]
        sents = full_person_sents(person, c["person_sents"])
        link = c["work_sents"][c["link_sid"]]
        for qa in ext.get("qa", []):
            check_qa(person, c["work"], link, sents, qa, problems, seen_q)

    by_person = {}
    for c in all_chains:
        by_person.setdefault(c["person"], []).append(c)
    for person, fams in EXTRA_QUESTIONS.items():
        chains = by_person.get(person)
        if not chains:
            problems.append(f"extra questions for unknown person {person!r}")
            continue
        fam_qa = {}
        for c in chains:
            if "answer" in c:
                fam_qa.setdefault("birthplace",
                                  (c, c["answer"], c["answer_sid"]))
            for qa in c.get("qa", []):
                fam_qa.setdefault(qa.get("family"),
                                  (c, qa["answer"], qa["answer_sid"]))
        for qa in EXTENSIONS.get(person, {}).get("qa", []):
            fam_qa.setdefault(qa.get("family"),
                              (chains[0], qa["answer"], qa["answer_sid"]))
        for fam_name, qs in fams.items():
            if fam_name not in fam_qa:
                problems.append(f"{person}: extra questions for family "
                                f"{fam_name!r} with no qa of that family")
                continue
            c, answer, answer_sid = fam_qa[fam_name]
            sents = full_person_sents(person, c["person_sents"])
            link = c["work_sents"][c["link_sid"]]
            check_qa(person, c["work"], link, sents,
                     {"answer_sid": answer_sid, "answer": answer,
                      "questions": qs}, problems, seen_q)
            fam[fam_name] = fam.get(fam_name, 0) + len(qs)

    for title, sents in DISTRACTOR_DOCS.items():
        if len(sents) < 2:
            problems.append(f"distractor {title!r}: fewer than 2 sentences")

    n_q = len(seen_q)
    n_sents = sum(len(full_person_sents(p, c["person_sents"]))
                  + len(c["work_sents"])
                  for p, c in persons.items())
    n_sents += sum(len(c["person_sents"]) + len(c["work_sents"])
                   for c in NEW_CHAINS)
    n_sents += sum(len(s) for s in DISTRACTOR_DOCS.values())
    for c in all_chains:
        for qa in c.get("qa", []):
            fam[qa.get("family", "?")] = fam.get(qa.get("family", "?"), 0) \
                + len(qa["questions"])
        if "answer" in c:
            fam["birthplace"] = fam.get("birthplace", 0) + len(c["questions"])
    for ext in EXTENSIONS.values():
        for qa in ext.get("qa", []):
            fam[qa.get("family", "?")] = fam.get(qa.get("family", "?"), 0) \
                + len(qa["questions"])

    print(f"chains={len(all_chains)} questions={n_q} sentences~={n_sents}")
    print(f"families: {fam}")
    if problems:
        print(f"\n{len(problems)} problems:")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    print("lint OK")


if __name__ == "__main__":
    main()
