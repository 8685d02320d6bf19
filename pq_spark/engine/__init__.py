from .runner import PqEngine, run_cli

__all__ = ["PqEngine", "run_cli"]
