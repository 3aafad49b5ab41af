"""v2 graph-assembly request schema.

Parity with /root/reference/app/schemas/graph_request_v2.py — the richer
request shape accepted by the v1->v2 adapter (`adapters.graph_request_adapter`).
"""
from __future__ import annotations

from typing import Any, Dict, List

from pydantic import BaseModel, Field


class Sentence(BaseModel):
    id: str
    text: str
    meta: Dict[str, Any] = Field(default_factory=dict)


class Inputs(BaseModel):
    sentences: List[Sentence] = Field(default_factory=list)
    nodes: List[Dict[str, Any]] = Field(default_factory=list)
    edges: List[Dict[str, Any]] = Field(default_factory=list)


class AssembleGraphRequestV2(BaseModel):
    api_version: str = "v2"
    graph_id: str
    inputs: Inputs = Field(default_factory=Inputs)
    options: Dict[str, Any] = Field(default_factory=dict)
