"""The verifier's deterministic grounding gate (VERDICT r4 item 4): with
mock LLMs it must FAIL answers whose span is absent from the evidence,
call unanchored-and-uncovered answers INCONCLUSIVE (both drive the
orchestrator's claim-retrieval retry), and keep passing correct grounded
answers. Signals are pure string analysis — independent of the reasoner."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from a_modular_rag_framework_tpu.core.dto import Hit, VerifyIn
from a_modular_rag_framework_tpu.core.llm_router import LLMRouter
from a_modular_rag_framework_tpu.core.providers.mock_provider import (
    MockProvider,
)
from a_modular_rag_framework_tpu.modules.verification.impl_rules_llm import (
    VerifierAgentRulesLLM,
    ground_answer,
)
from a_modular_rag_framework_tpu.orchestrator.nodes import should_retry

QUESTION = "In which city was the director of the film Jaws born?"

EVIDENCE = [
    Hit(id="sent::Jaws (film)::0", score=1.0,
        meta={"doc": "Jaws (film)", "sent_id": 0,
              "text": "Jaws is a 1975 American thriller film directed by "
                      "Steven Spielberg."}),
    Hit(id="sent::Steven Spielberg::1", score=0.9,
        meta={"doc": "Steven Spielberg", "sent_id": 1,
              "text": "He was born in Cincinnati, Ohio, on December 18, "
                      "1946."}),
    Hit(id="sent::Tetris::1", score=0.5,
        meta={"doc": "Tetris", "sent_id": 1,
              "text": "Alexey Pajitnov programmed the first version in "
                      "1984 at a Soviet computing centre."}),
]


def make_verifier(**kw):
    router = LLMRouter(
        providers={"mock": MockProvider()},
        policy={"default": [{"provider": "mock", "model": "mock"}]},
    )
    return VerifierAgentRulesLLM(router, sc_runs=1, **kw)


def test_grounded_correct_answer_passes():
    out = make_verifier().verify(VerifyIn(
        answer="Cincinnati [#2] [#1]", evidence=EVIDENCE,
        question=QUESTION, query=QUESTION))
    assert out.ok
    assert out.verdict in ("PASS", "PASS-WITH-NOISE", "PARTIAL")
    g = out.diagnostics["grounding"]
    assert g["span_grounded"] and g["chain_anchored"] and g["ask_covered"]


def test_fabricated_span_fails_unsupported():
    out = make_verifier().verify(VerifyIn(
        answer="Constantinople [#1]", evidence=EVIDENCE,
        question=QUESTION, query=QUESTION))
    assert not out.ok
    assert out.verdict == "FAIL-UNSUPPORTED"
    assert should_retry(out.model_dump(), retries=0)


def test_unconnected_span_is_inconclusive():
    # span exists in evidence, but its doc (Tetris) neither names a
    # question entity nor covers the asked relation (born/city)
    out = make_verifier().verify(VerifyIn(
        answer="Alexey Pajitnov [#3]", evidence=EVIDENCE,
        question=QUESTION, query=QUESTION))
    assert not out.ok
    assert out.verdict == "INCONCLUSIVE"
    assert should_retry(out.model_dump(), retries=0)


def test_wrong_span_in_right_doc_does_not_hard_fail():
    # precision guard: "December" sits in the anchored Spielberg doc —
    # grounded + anchored, so at most a demotion, never a retry loop
    out = make_verifier().verify(VerifyIn(
        answer="December [#2]", evidence=EVIDENCE,
        question=QUESTION, query=QUESTION))
    assert out.ok


def test_ground_answer_bridge_anchoring():
    g = ground_answer(QUESTION, "Cincinnati [#2]", EVIDENCE)
    # holder (Steven Spielberg doc) never names Jaws; the bridge runs
    # through the Jaws doc's link sentence naming Spielberg
    assert g["span_grounded"] and g["chain_anchored"]


def test_empty_answer_not_grounded():
    g = ground_answer(QUESTION, "", EVIDENCE)
    assert not g["span_grounded"]
