"""clustertracking_tpu — TPU-native cluster tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
caspervdw/clustertracking (see SURVEY.md): tracking clusters of overlapping
features in 2D video / 3D z-stacks by fitting sums of model functions to
image subregions, with cluster discovery, constrained refinement,
frame-to-frame linking, and cluster-diffusion analysis.

Public API (DataFrame in / DataFrame out, matching the reference contract):

    find_clusters, refine_leastsq, train_leastsq, link,
    constraints (dimer, trimer, tetramer, dimer_global),
    artificial (draw_feature, draw_cluster, CoordinateReader, ...),
    motion (orientation, diffusion estimators)
"""
from . import models, ops, utils  # noqa: F401

__version__ = "0.1.0"

from .find import Clusters, find_clusters  # noqa: E402
from .refine import refine_leastsq, train_leastsq  # noqa: E402
from .constraints import (  # noqa: E402
    dimer,
    dimer_global,
    tetramer,
    trimer,
)
from .link import link, link_df, filter_stubs  # noqa: E402
from . import artificial, diagnostics, motion  # noqa: E402
from .pipeline import locate, track  # noqa: E402

__all__ = [
    "Clusters",
    "find_clusters",
    "refine_leastsq",
    "train_leastsq",
    "dimer",
    "trimer",
    "tetramer",
    "dimer_global",
    "link",
    "filter_stubs",
    "link_df",
    "locate",
    "track",
    "artificial",
    "diagnostics",
    "motion",
    "models",
    "ops",
    "utils",
]
