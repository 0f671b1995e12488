from .attention import attention, mha_reference

__all__ = ["attention", "mha_reference"]
