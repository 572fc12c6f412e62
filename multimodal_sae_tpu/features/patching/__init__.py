from .attribution import Attribution
from .utils import get_logit_diff, sae_splice_intervention

__all__ = ["Attribution", "get_logit_diff", "sae_splice_intervention"]
