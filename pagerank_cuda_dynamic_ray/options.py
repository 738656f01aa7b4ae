"""Engine options/results.

Mirrors the observable API of the reference's ``PagerankOptions``
(/root/reference/inc/pagerank.hxx:25-55) and ``PagerankResult``
(/root/reference/inc/pagerank.hxx:65-113): same defaults, same phase
timings (initialization / marking / computation), plus the per-partition
metrics the Ray engine adds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class PagerankOptions:
    """Defaults match /root/reference/inc/pagerank.hxx:34-44."""

    repeat: int = 1                   # timing runs averaged (reference REPEAT_METHOD,
                                      # /root/reference/inc/_utility.hxx:113-119)
    tolerance: float = 1e-10          # L-inf iteration tolerance (pagerank.hxx:391)
    frontier_tolerance: float = 1e-6  # DF expansion threshold (pagerank.hxx:700)
    prune_tolerance: float = 1e-6     # DF-P prune threshold (pagerankPrune.hxx:62)
    damping: float = 0.85
    max_iterations: int = 500
    # Ray-engine additions (no reference equivalent):
    # "selfloops": dead ends eliminated up-front by adding (v,v) for every
    # vertex, as the reference driver does (main.cu:168-169).
    # "redistribute": no self-loops; dangling rank mass is globally
    # tree-reduced each iteration and teleported uniformly.
    dangling: str = "selfloops"
    checkpoint_every: int = 0         # 0 = no per-iteration checkpoints
    checkpoint_dir: str | None = None
    run_id: str = "run0"


@dataclass
class PagerankResult:
    """Observable result, matching pagerank.hxx:65-113 + main.cu:56-60 log fields."""

    ranks: Any                        # np.ndarray[float64] indexed by vid
    iterations: int
    time: float                       # total seconds
    initialization_time: float
    marking_time: float
    computation_time: float
    # Ray-engine additions:
    linf_delta: float = 0.0           # last iteration's L-inf delta
    metrics: list = field(default_factory=list)  # per-iteration per-partition dicts
