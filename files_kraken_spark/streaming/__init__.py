from .runtime import Watcher, Workflow

__all__ = ["Watcher", "Workflow"]
