from . import retools, text, vectors

__all__ = ["retools", "text", "vectors"]
