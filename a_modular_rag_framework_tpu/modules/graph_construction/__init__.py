from .flow import GraphConstructionFlow
from .impl_arrays import GraphConstructionArrays
from .node_builder import NodeBuilder
from .edge_builder import EdgeBuilder
from .segmenter import segment_context, simple_rule_split

__all__ = [
    "EdgeBuilder",
    "GraphConstructionArrays",
    "GraphConstructionFlow",
    "NodeBuilder",
    "segment_context",
    "simple_rule_split",
]
