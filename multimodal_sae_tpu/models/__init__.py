from .api import ActivationSource, SyntheticActivationSource

__all__ = ["ActivationSource", "SyntheticActivationSource"]
