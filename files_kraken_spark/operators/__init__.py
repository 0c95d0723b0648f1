from . import diff, dedup, multimodal, similarity

__all__ = ["diff", "dedup", "multimodal", "similarity"]
