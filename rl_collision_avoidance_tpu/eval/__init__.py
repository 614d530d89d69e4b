from .circle import run_circle_eval

__all__ = ["run_circle_eval"]
