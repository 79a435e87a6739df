"""Observability: profiler trace annotations + per-batch fit statistics.

The reference has no tracing, metrics, or logging beyond failed-fit
semantics (SURVEY.md §5 "Tracing / profiling: absent").  This module is the
TPU-native equivalent called for there: `jax.profiler` annotations around
the pipeline stages and first-class per-dispatch solver statistics
(clusters/sec is the north-star metric, so it must be measurable in
production, not only in benchmarks).

Usage::

    import clustertracking_tpu as ct

    with ct.diagnostics.collect() as stats:
        out = ct.refine_leastsq(f, reader, diameter=9)
    print(stats.summary())          # dict: clusters, rejects, iters, rate
    for s in stats.batches:         # per-dispatch records
        print(s)

    # profiler trace (view in TensorBoard / xprof):
    with ct.diagnostics.trace_to("/tmp/trace"):
        ct.refine_leastsq(...)

Stage annotations (`stage("gather")`) are no-ops unless a profiler trace is
active, so they are always on in the library code.
"""
from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import threading
from typing import List, Optional

logger = logging.getLogger("clustertracking_tpu")

__all__ = ["BatchRecord", "StatsCollector", "collect", "stage",
           "trace_to", "debug_nans", "nan_debug_active"]

# --------------------------------------------------------------------------
# Non-finite trap (SURVEY.md §5 sanitizers row; VERDICT r4 item 9).
#
# By default a lane whose solve goes non-finite is a silently REJECTED
# cluster (cost NaN, originals kept) — the right production semantics,
# but for a user debugging a custom model dict it is silent data loss.
# With the trap armed (``with ct.diagnostics.debug_nans(): ...`` or env
# ``CT_TPU_DEBUG_NANS=1``), refine_leastsq raises FloatingPointError at
# the first dispatch that produces a non-finite fit cost, naming the
# bucket config (model, cluster size, window, backend), the offending
# cluster, and whether the MODEL ITSELF is non-finite at the initial
# parameters (the custom-dfun bug class) or the solve diverged.
# --------------------------------------------------------------------------
_NAN_DEBUG_ENV = os.environ.get("CT_TPU_DEBUG_NANS", "") not in ("", "0")


def nan_debug_active() -> bool:
    """True when the non-finite trap is armed (context or env var)."""
    return getattr(_local, "nan_debug", _NAN_DEBUG_ENV)


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Arm the non-finite trap on this thread for the enclosed block."""
    prev = getattr(_local, "nan_debug", None)
    _local.nan_debug = bool(enabled)
    try:
        yield
    finally:
        if prev is None:
            del _local.nan_debug
        else:
            _local.nan_debug = prev


@dataclasses.dataclass
class BatchRecord:
    """One solver dispatch (one bucket of clusters, one frame chunk)."""

    cluster_size: int
    n_clusters: int          # valid lanes
    n_lanes: int             # padded batch
    n_converged: int
    n_rejected: int          # rms > max_rms_dev (originals kept)
    mean_lm_iters: float
    max_lm_iters: int
    mean_rms: float
    wall_s: float            # dispatch wall-clock (incl. host sync)
    backend: str             # 'pallas' | 'xla' | 'xla-global' | 'scipy'

    @property
    def clusters_per_sec(self) -> float:
        return self.n_clusters / self.wall_s if self.wall_s > 0 else 0.0


class StatsCollector:
    """Accumulates BatchRecords from refine_leastsq dispatches, plus the
    pipeline loss ledger (per-stage feature counts from track())."""

    def __init__(self):
        self.batches: List[BatchRecord] = []
        self.ledger: dict = {}

    def add(self, rec: BatchRecord) -> None:
        self.batches.append(rec)
        logger.debug(
            "fit batch: n=%d B=%d/%d conv=%d rej=%d iters=%.1f "
            "rms=%.4g %.1f clusters/s [%s]",
            rec.cluster_size, rec.n_clusters, rec.n_lanes,
            rec.n_converged, rec.n_rejected, rec.mean_lm_iters,
            rec.mean_rms, rec.clusters_per_sec, rec.backend,
        )

    def summary(self) -> dict:
        if not self.batches:
            return {"n_clusters": 0}
        n = sum(b.n_clusters for b in self.batches)
        wall = sum(b.wall_s for b in self.batches)
        return {
            "n_batches": len(self.batches),
            "n_clusters": n,
            "n_converged": sum(b.n_converged for b in self.batches),
            "n_rejected": sum(b.n_rejected for b in self.batches),
            "lane_occupancy": n / max(
                sum(b.n_lanes for b in self.batches), 1
            ),
            "mean_lm_iters": sum(
                b.mean_lm_iters * b.n_clusters for b in self.batches
            ) / max(n, 1),
            "wall_s": wall,
            "clusters_per_sec": n / wall if wall > 0 else 0.0,
        }

    def summary_by_backend(self) -> dict:
        """Per-backend {n_clusters, wall_s, clusters_per_sec} — separates
        the batched device rate from e.g. the serial scipy spill path."""
        out: dict = {}
        for b in self.batches:
            d = out.setdefault(
                b.backend, {"n_clusters": 0, "wall_s": 0.0}
            )
            d["n_clusters"] += b.n_clusters
            d["wall_s"] += b.wall_s
        for d in out.values():
            d["clusters_per_sec"] = (
                d["n_clusters"] / d["wall_s"] if d["wall_s"] > 0 else 0.0
            )
        return out


_local = threading.local()


def _active_collector() -> Optional[StatsCollector]:
    return getattr(_local, "collector", None)


@contextlib.contextmanager
def collect():
    """Context manager: collect per-batch fit statistics on this thread."""
    prev = _active_collector()
    _local.collector = StatsCollector()
    try:
        yield _local.collector
    finally:
        _local.collector = prev


def record_batch(**kwargs) -> None:
    """Internal: called by refine_leastsq after each solver dispatch."""
    c = _active_collector()
    rec = BatchRecord(**kwargs)
    if c is not None:
        c.add(rec)
    else:
        logger.debug("fit batch (uncollected): %s", rec)


def record_ledger(**counts) -> None:
    """Internal: accumulate pipeline loss-ledger counters (track()).

    Counters are summed into the active collector's ``ledger`` so every
    feature lost between locate and the linked output is attributed to a
    stage (SURVEY.md §5 failure detection; VERDICT round-1 item 5)."""
    c = _active_collector()
    if c is None:
        logger.debug("pipeline ledger (uncollected): %s", counts)
        return
    for k, v in counts.items():
        if isinstance(v, str):
            # labels (e.g. the resolved link backend) overwrite
            c.ledger[k] = v
        else:
            c.ledger[k] = c.ledger.get(k, 0) + v


@contextlib.contextmanager
def stage(name: str):
    """Profiler annotation around a pipeline stage (no-op w/o a trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
