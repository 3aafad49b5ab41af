"""Evaluation harness: retrieval Recall@k/MRR/QPS and end-to-end EM/F1.

The measurement counterpart of BASELINE.md: `evaluate_retrieval` drives the
query engine over a labeled sample set (supporting facts as gold sentence
ids), and `evaluate_system` runs the full agent pipeline and scores answers.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .metrics import contains_match, exact_match, f1_score, mrr, recall_at_k


def gold_hit_ids(sample: Dict[str, Any]) -> List[str]:
    """Supporting facts -> canonical ``sent::<title>::<sid>`` hit ids."""
    return [f"sent::{t}::{sid}" for t, sid in sample.get("supporting_facts", [])]


def evaluate_retrieval(
    engine,
    samples: Sequence[Dict[str, Any]],
    *,
    k: int = 10,
    batch_size: int = 64,
    expansions: Optional[Sequence[Sequence[str]]] = None,
) -> Dict[str, Any]:
    """Batch the questions through the engine; report Recall@k, MRR, QPS."""
    questions = [s["question"] for s in samples]
    recalls: List[float] = []
    rrs: List[float] = []
    t_total = 0.0
    n_q = 0

    for start in range(0, len(questions), batch_size):
        batch = questions[start : start + batch_size]
        exp = (list(expansions[start : start + batch_size])
               if expansions is not None else None)
        t0 = time.time()
        result = engine.query_batch(batch, expansions=exp, top_k=max(k, 10))
        t_total += time.time() - t0
        n_q += len(batch)
        ids = np.asarray(result.hits.ids)
        for row, sample in enumerate(samples[start : start + batch_size]):
            retrieved = [engine.index.corpus.hit_id(int(i))
                         for i in ids[row] if i >= 0]
            gold = gold_hit_ids(sample)
            recalls.append(recall_at_k(retrieved, gold, k))
            rrs.append(mrr(retrieved, gold))

    return {
        "n": n_q,
        f"recall_at_{k}": float(np.mean(recalls)) if recalls else 0.0,
        "mrr": float(np.mean(rrs)) if rrs else 0.0,
        "total_sec": round(t_total, 4),
        "qps": round(n_q / t_total, 2) if t_total > 0 else 0.0,
    }


def evaluate_system(
    answer_fn,
    samples: Sequence[Dict[str, Any]],
    *,
    mode: str = "full",
) -> Dict[str, Any]:
    """Run the full pipeline per sample and score answers (EM / relaxed EM /
    F1) plus verifier verdict distribution."""
    ems: List[float] = []
    cms: List[float] = []
    f1s: List[float] = []
    verdicts: Dict[str, int] = {}
    records: List[Dict[str, Any]] = []
    t0 = time.time()
    for s in samples:
        res = answer_fn(s["question"], mode=mode)
        pred = ((res.get("reasoning") or {}).get("answer")) or ""
        gold = s.get("answer") or ""
        ems.append(exact_match(pred, gold))
        cms.append(contains_match(pred, gold))
        f1s.append(f1_score(pred, gold))
        verdict = str((res.get("verification") or {}).get("verdict"))
        verdicts[verdict] = verdicts.get(verdict, 0) + 1
        records.append({"id": s.get("_id"), "question": s["question"],
                        "gold": gold, "pred": pred, "verdict": verdict,
                        "retry_round": res.get("retry_round", 0)})
    total = time.time() - t0
    return {
        "n": len(samples),
        "em": float(np.mean(ems)) if ems else 0.0,
        "em_relaxed": float(np.mean(cms)) if cms else 0.0,
        "f1": float(np.mean(f1s)) if f1s else 0.0,
        "verdicts": verdicts,
        "total_sec": round(total, 2),
        "records": records,
    }
