from .flow import VerifierAgentFlow
from .impl_rules_llm import StatusDetail, VerifierAgentRulesLLM

__all__ = ["StatusDetail", "VerifierAgentFlow", "VerifierAgentRulesLLM"]
