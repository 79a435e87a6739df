"""Model functions and parameter packing (fitfunc.py parity layer)."""
from .registry import MODELS, ModelSpec, get_model, register_model
from .packing import (
    MODE_CODES,
    ParamLayout,
    build_layout,
    param_names_for,
)
from .packing import default_param_mode

__all__ = [
    "MODELS",
    "ModelSpec",
    "get_model",
    "register_model",
    "MODE_CODES",
    "ParamLayout",
    "build_layout",
    "param_names_for",
    "default_param_mode",
]
