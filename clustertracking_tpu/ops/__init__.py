"""On-device compute ops: residuals, LM solver, gather, find, link."""
from .lm import LMResult, lm_solve, lm_solve_global
from .residual import make_model_fns, window_offsets

__all__ = [
    "LMResult",
    "lm_solve",
    "lm_solve_global",
    "make_model_fns",
    "window_offsets",
]
