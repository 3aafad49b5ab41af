"""Iterative bridge-entity retrieval: hop-2 recall must improve markedly."""
import numpy as np
import pytest

from a_modular_rag_framework_tpu.core.dataset_loader import SyntheticHotpotQALoader
from a_modular_rag_framework_tpu.engine.query_engine import EngineConfig, TPUQueryEngine
from a_modular_rag_framework_tpu.index.builder import build_packed_index
from a_modular_rag_framework_tpu.index.corpus import SentenceCorpus
from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
    bridge_entities,
    hop2_queries_for,
    iterative_retrieve,
)


@pytest.fixture(scope="module")
def setup():
    samples = SyntheticHotpotQALoader({"count": 20, "seed": 5}).load()
    corpus = SentenceCorpus.from_hotpotqa(samples)
    idx = build_packed_index(corpus, embed_dim=64, embed_dtype="float32")
    engine = TPUQueryEngine(idx, config=EngineConfig(top_k=20, pool_k=100,
                                                     graph_window=2,
                                                     batch_buckets=(16,)))
    return engine, samples


def _recall(ids, samples, by):
    hit = total = hop2 = 0
    for b, s in enumerate(samples):
        got = set(int(i) for i in ids[b] if i >= 0)
        for hop, (t, sid) in enumerate(s["supporting_facts"]):
            row = by.get((t, sid))
            if row is None:
                continue
            total += 1
            hit += int(row in got)
            hop2 += int(hop == 1 and row in got)
    return hit, total, hop2


def test_bridge_entity_extraction():
    q = "In which city was the collaborator of Alice Smith born?"
    texts = [
        "Bob Jones was born in Rome.",  # no question entity -> ignored
        "Alice Smith collaborated closely with Bob Jones.",
        "Later in life Alice Smith retired.",  # 'Later' must not be a bridge
    ]
    titles = {"Alice Smith", "Bob Jones"}
    bridges = bridge_entities(q, texts, known_titles=titles)
    assert bridges == ["Bob Jones"]
    variants = hop2_queries_for(q, bridges)
    assert variants and "Bob Jones" in variants[0] and "born" in variants[0]


def test_iterative_beats_single_pass(setup):
    engine, samples = setup
    by = engine.index.corpus.row_by_title_sid()
    qs = [s["question"] for s in samples[:16]]

    r1 = engine.query_batch(qs, top_k=20)
    h1, total, h2_single = _recall(np.asarray(r1.hits.ids), samples[:16], by)

    ids, scores, norms, diag = iterative_retrieve(engine, qs, top_k=20)
    h, _, h2_iter = _recall(ids, samples[:16], by)

    assert diag["hop2_active"] > 8
    assert h > h1, f"iterative {h} <= single {h1} (of {total})"
    assert h2_iter > h2_single
    # scores sorted descending, norms aligned
    assert ids.shape == (16, 20) and norms.shape == (16, 3, 20)
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_iterative_backend_hits_tagged(setup):
    """The hybrid backend with iterative_hops=2 returns hydrated hits."""
    from a_modular_rag_framework_tpu.core.dto import RetrievalIn
    from a_modular_rag_framework_tpu.modules.retrieval.tpu_backend import (
        TPUHybridRetrievalBackend,
    )

    engine, samples = setup
    backend = TPUHybridRetrievalBackend(engine=engine, iterative_hops=2)
    out = backend.retrieve(RetrievalIn(query=samples[0]["question"],
                                       graph_id="", top_k=10, trace_id="t"))
    assert out.hits and out.hits[0].id.startswith("sent::")
    assert "hop2_active" in out.diagnostics
