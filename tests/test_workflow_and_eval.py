"""Orchestrator retry loop with stub agents + eval metric unit tests."""
import pytest

from a_modular_rag_framework_tpu.core.dto import (
    GraphBuildIn,
    GraphBuildOut,
    Hit,
    ReasoningIn,
    ReasoningOut,
    RetrievalIn,
    RetrievalOut,
    VerifyIn,
    VerifyOut,
)
from a_modular_rag_framework_tpu.eval.metrics import (
    contains_match,
    exact_match,
    f1_score,
    mrr,
    recall_at_k,
)
from a_modular_rag_framework_tpu.orchestrator.nodes import NodeContext
from a_modular_rag_framework_tpu.orchestrator.workflow import build_workflow


class StubGraph:
    def build(self, req: GraphBuildIn) -> GraphBuildOut:
        return GraphBuildOut(graph_id="g-stub", node_count=1, edge_count=0)


class StubRetriever:
    def __init__(self):
        self.calls = []

    def retrieve(self, req: RetrievalIn) -> RetrievalOut:
        self.calls.append(req.query)
        return RetrievalOut(hits=[Hit(id="h1", score=1.0,
                                      meta={"text": "stub evidence"})])


class StubReasoner:
    def __init__(self):
        self.calls = 0

    def reason(self, req: ReasoningIn) -> ReasoningOut:
        self.calls += 1
        return ReasoningOut(answer=f"answer v{self.calls} [#1]")


class FailingThenPassingVerifier:
    """First verify: INCONCLUSIVE with claims -> triggers RetryRetrieval;
    second verify: PASS."""

    def __init__(self):
        self.calls = 0

    def verify(self, req: VerifyIn) -> VerifyOut:
        self.calls += 1
        if self.calls == 1:
            return VerifyOut(
                status="fail", verdict="INCONCLUSIVE", final_score=0.2,
                status_detail="fail",
                diagnostics={"claim_check": {"results": [
                    {"claim": "the sky is green"},
                    {"claim": "water is wet"},
                ]}},
            )
        return VerifyOut(status="pass", verdict="PASS", final_score=0.9,
                         status_detail="high_conf_pass")


def run_workflow(verifier):
    retriever = StubRetriever()
    reasoner = StubReasoner()
    ctx = NodeContext(graph_c=StubGraph(), retriever=retriever,
                      reasoner=reasoner, verifier=verifier, sink=None)
    wf = build_workflow(ctx)
    final = wf.invoke({"question": "q?", "trace_id": "t",
                       "policy": {"mode": "full"}, "external_context": {}})
    return final, retriever, reasoner


def test_retry_loop_fires_once_on_failure():
    verifier = FailingThenPassingVerifier()
    final, retriever, reasoner = run_workflow(verifier)
    result = final["result"]
    # claim retrieval ran with the question + joined claims as the query
    # (the question stays in: claims from a wrong answer alone steer the
    # re-retrieval to the wrong answer's neighborhood)
    assert any("q?; the sky is green; water is wet" == q
               for q in retriever.calls)
    assert reasoner.calls == 2          # re-reasoned after retry
    assert verifier.calls == 2          # re-verified, then packed
    assert result["retry_round"] == 1
    assert result["retrieval_source"] == "claim-retrieval"
    assert result["verification"]["verdict"] == "PASS"


class AlwaysFailingVerifier:
    def __init__(self):
        self.calls = 0

    def verify(self, req: VerifyIn) -> VerifyOut:
        self.calls += 1
        return VerifyOut(status="fail", verdict="FAIL-CONTRADICTED",
                         final_score=0.1, status_detail="fail",
                         diagnostics={"claim_check": {"results": [
                             {"claim": "c1"}]}})


def test_retry_loop_bounded_at_one():
    verifier = AlwaysFailingVerifier()
    final, retriever, reasoner = run_workflow(verifier)
    assert verifier.calls == 2  # initial + one retry, then forced pack
    assert final["result"]["retry_round"] == 1


class PassingVerifier:
    def verify(self, req: VerifyIn) -> VerifyOut:
        return VerifyOut(status="pass", verdict="PASS", final_score=0.95,
                         status_detail="high_conf_pass")


def test_no_retry_on_pass():
    final, retriever, reasoner = run_workflow(PassingVerifier())
    assert reasoner.calls == 1
    assert final["result"]["retry_round"] == 0
    assert final["result"]["retrieval_source"] == "default"


def test_empty_question_raises():
    ctx = NodeContext(graph_c=StubGraph(), retriever=StubRetriever(),
                      reasoner=StubReasoner(), verifier=PassingVerifier())
    wf = build_workflow(ctx)
    with pytest.raises(ValueError, match="Empty question"):
        wf.invoke({"question": "   ", "trace_id": "t",
                   "policy": {"mode": "full"}})


# ---------------- eval metrics ----------------


def test_metric_functions():
    assert exact_match("The Paris!", "paris") == 1.0
    assert exact_match("Paris, France", "paris") == 0.0
    assert contains_match("She was born in Paris. [#2]", "Paris") == 1.0
    assert contains_match("no idea", "Paris") == 0.0
    assert 0 < f1_score("born in Paris", "Paris") < 1
    assert f1_score("", "x") == 0.0
    assert recall_at_k(["a", "b", "c"], ["b", "z"], 2) == 0.5
    assert recall_at_k([], ["x"], 5) == 0.0
    assert mrr(["a", "b", "gold"], ["gold"]) == pytest.approx(1 / 3)
    assert mrr(["a"], ["gold"]) == 0.0


def test_canonical_sent_key_reference_spellings():
    """The measured-baseline metric layer canonicalizes every hit-id
    spelling the reference emits (raw doc-id dense keys, empty sid for
    sent_id=0)."""
    from a_modular_rag_framework_tpu.eval.reference_harness import (
        canonical_sent_key,
    )

    assert canonical_sent_key("sent::Doc A::3") == ("Doc A", "3")
    # reference writes sent_id=0 as an empty sid
    assert canonical_sent_key("sent::Doc A::") == ("Doc A", "0")
    # dense-channel raw doc ids: sent::<title>#<sid>::<sid>
    assert canonical_sent_key("sent::Doc A#3::3") == ("Doc A", "3")
    assert canonical_sent_key("sent::Doc A#0::") == ("Doc A", "0")
    # non-sentence ids (the reference's page-level graph hits) drop out
    assert canonical_sent_key("sent::Doc A") is None
    assert canonical_sent_key("sent::Doc::x") is None
    assert canonical_sent_key("") is None


def test_score_hits_dedups_spellings():
    from a_modular_rag_framework_tpu.eval.reference_harness import score_hits

    sample = {"supporting_facts": [["Doc A", 0], ["Doc B", 1]]}
    # duplicate spellings of the same sentence must count once; rank of
    # the first gold decides the reciprocal rank
    r, rr = score_hits(
        ["sent::Doc X::2", "sent::Doc A#0::", "sent::Doc A::",
         "sent::Doc B::1"], sample, k=10)
    assert r == 1.0
    assert rr == 0.5
