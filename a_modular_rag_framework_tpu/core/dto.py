"""Core data contracts (L2).

Pydantic DTOs mirroring the reference's module I/O contracts
(see /root/reference/app/core/dto.py:9-209) plus the TPU-native device
currency: retrieval hit batches travel between device programs as
``(ids: int32[B, K], scores: float32[B, K])`` arrays (`HitBatch`), and are
hydrated into per-hit `Hit` objects only at the host boundary.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
from pydantic import BaseModel, ConfigDict, Field


# ========= Graph build =========


class GraphBuildIn(BaseModel):
    trace_id: str
    question_text: str = ""
    context: List[Any] = Field(default_factory=list)

    graph_id: Optional[str] = None
    nodes: List[Dict[str, Any]] = Field(default_factory=list)
    edges: List[Dict[str, Any]] = Field(default_factory=list)

    extra: Dict[str, Any] = Field(default_factory=dict)


class GraphBuildOut(BaseModel):
    graph_id: str
    node_count: int
    edge_count: int

    nodes: Optional[List[Dict[str, Any]]] = None
    edges: Optional[List[Dict[str, Any]]] = None
    provenance: Optional[Dict[str, Any]] = None
    diagnostics: Optional[Dict[str, Any]] = None

    extra: Dict[str, Any] = Field(default_factory=dict)


# ========= Retrieval =========


class RetrievalIn(BaseModel):
    query: str
    graph_id: str = ""
    top_k: int = 20
    trace_id: str
    # Optional per-request override of the graph expansion window (hops),
    # honored by the hybrid backend like the reference's req.graph_window.
    graph_window: Optional[int] = None


class Hit(BaseModel):
    id: str
    score: float
    meta: Dict[str, Any] = Field(default_factory=dict)


class RetrievalOut(BaseModel):
    hits: List[Hit] = Field(default_factory=list)
    diagnostics: Dict[str, Any] = Field(default_factory=dict)
    model: Optional[str] = None


class HitBatch(BaseModel):
    """Device-side retrieval currency: a batch of top-K hits as arrays.

    ``ids`` are row indices into a corpus table (int32, shape [B, K]);
    ``scores`` are fused relevance scores (float32, shape [B, K]).
    ``-1`` ids mark padding (fewer than K real candidates).

    Host code converts to `Hit` lists via `hydrate` with a corpus metadata
    lookup. This replaces the reference's per-hit dict flow
    (retrieval_backend.py:336-372) with a single device->host transfer.
    """

    model_config = ConfigDict(arbitrary_types_allowed=True)

    ids: Any  # np.ndarray int32 [B, K]
    scores: Any  # np.ndarray float32 [B, K]

    def hydrate(
        self,
        row: int,
        id_fn,
        meta_fn,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> List[Hit]:
        """Convert one batch row into host `Hit`s, skipping padding."""
        ids = np.asarray(self.ids)[row]
        scores = np.asarray(self.scores)[row]
        hits: List[Hit] = []
        for i, s in zip(ids.tolist(), scores.tolist()):
            if i < 0:
                continue
            meta = dict(meta_fn(i) or {})
            if extra_meta:
                meta.update(extra_meta)
            hits.append(Hit(id=str(id_fn(i)), score=float(s), meta=meta))
        return hits


# ========= Reasoning =========


class ReasoningIn(BaseModel):
    question: str
    hits: List[Hit] = Field(default_factory=list)
    graph_id: str = ""
    trace_id: str


class ReasoningOut(BaseModel):
    answer: str
    evidence_used: List[Hit] = Field(default_factory=list)
    steps: List[Dict[str, Any]] = Field(default_factory=list)
    model: Optional[str] = None


# ========= Verification =========


class VerifyIn(BaseModel):
    answer: str
    evidence: List[Hit] = Field(default_factory=list)
    question: Optional[str] = None
    query: Optional[str] = None
    graph_id: Optional[str] = None
    trace_id: Optional[str] = None
    retry_round: int = 0


class VerifyOut(BaseModel):
    """Verifier output.

    ``status``: coarse "pass" | "fail" | "warn".
    ``status_detail``: fine-grained state — "fail", "high_conf_pass",
    "low_conf_pass", "unknown_pass" (see `modules.verification`).
    ``verdict``: fine verdict — PASS | PASS-WITH-NOISE | PARTIAL |
    FAIL-CONTRADICTED | FAIL-UNSUPPORTED | INCONCLUSIVE.
    Matches the contract of the reference verifier
    (/root/reference/app/core/dto.py:86-183).
    """

    status: str
    findings: List[Dict[str, Any]] = Field(default_factory=list)
    model: Optional[str] = None

    ok: Optional[bool] = None
    score: Optional[float] = None
    issues: List[str] = Field(default_factory=list)
    diagnostics: Dict[str, Any] = Field(default_factory=dict)

    coverage_score: Optional[float] = None
    consistency_score: Optional[float] = None
    hallucination_risk: Optional[float] = None
    final_score: Optional[float] = None

    verdict: Optional[str] = None
    self_consistency: Optional[Dict[str, Any]] = None

    recommended_action: Optional[str] = None

    status_detail: Optional[str] = None
    status_detail_label: Optional[str] = None


# ========= Graph atoms =========


class EdgeEvidence(BaseModel):
    channel: str
    score: float
    meta: Dict[str, Any] = Field(default_factory=dict)


class GraphNode(BaseModel):
    id: str
    type: str
    text: str
    meta: Dict[str, Any] = Field(default_factory=dict)


class GraphEdge(BaseModel):
    source: str
    target: str
    type: str
    weight: float = 1.0
    meta: Dict[str, Any] = Field(default_factory=dict)
    evidence: List[EdgeEvidence] = Field(default_factory=list)
