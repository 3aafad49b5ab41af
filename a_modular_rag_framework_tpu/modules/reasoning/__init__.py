from .flow import ReasoningAgentFlow
from .impl_planner_synth import ReasoningAgentPlannerSynth

__all__ = ["ReasoningAgentFlow", "ReasoningAgentPlannerSynth"]
