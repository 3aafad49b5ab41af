from .nodes import NodeContext
from .state import WFState
from .workflow import build_workflow

__all__ = ["NodeContext", "WFState", "build_workflow"]
