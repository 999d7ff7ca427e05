from .freq_chain import fused_freq_chain  # noqa: F401
