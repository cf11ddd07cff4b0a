"""Profiling & throughput counters (SURVEY.md §5: the reference has no
tracing/profiling tier; this is the framework's).

- `trace(dir)`: context manager around jax.profiler for device traces
  viewable in TensorBoard/XProf.
- `Counters`: lightweight throughput accounting — samples, search cells,
  blocks — with wall-time buckets; text report in one line per metric.
- `device_sync()`: a *real* device barrier on backends where
  jax.block_until_ready is a no-op (the axon tunnel): forces a tiny
  host readback that cannot complete before prior work.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


def device_sync(token=None):
    """Barrier that survives backends whose block_until_ready is a no-op.

    Pass any device array `token` that depends on the work to wait for;
    its 1-element readback forces completion."""
    if token is None:
        token = jnp.zeros(())
    leaf = jax.tree.leaves(token)[0]
    np.asarray(jnp.sum(jnp.ravel(leaf)[:1]))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Counters:
    """Accumulate throughput metrics across engine calls."""
    t0: float = field(default_factory=time.perf_counter)
    samples: int = 0
    cells: int = 0
    blocks: int = 0

    def report(self) -> str:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        parts = [f"wall {dt:.3f}s"]
        if self.samples:
            parts.append(f"{self.samples/dt/1e6:.1f} Msamples/s")
        if self.cells:
            parts.append(f"{self.cells/dt/1e9:.2f} Gcells/s")
        if self.blocks:
            parts.append(f"{self.blocks/dt:.0f} blocks/s")
        return "  ".join(parts)
