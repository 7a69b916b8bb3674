"""Multi-host decode: jax.distributed + per-host work sharding.

The reference is single-GPU single-process (SURVEY §2.7: no NCCL/MPI
anywhere).  For multi-host TPU pods the decode problem is embarrassingly
data-parallel: each host parses and entropy-decodes its share of the file
list and feeds its local chips; the only cross-host communication is the
final metrics reduction (DCN psum) and, in stripe mode, the ICI
all_gather inside `parallel.sharding`.

Typical use (same script on every host):

    from tpujpeg.parallel import distributed as dist
    dist.initialize()                       # jax.distributed.initialize()
    mine = dist.shard_list(all_paths)       # this host's files
    dec = BatchDecoder(...)                 # local chips only
    ... decode(mine) ...
    totals = dist.allreduce_metrics({"images": len(mine), "bytes": n})
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(**kwargs) -> None:
    """jax.distributed.initialize, tolerant of single-process runs."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-process / no coordinator configured: run standalone.
        pass


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def shard_list(items: list, index: int | None = None, count: int | None = None):
    """Deterministic round-robin shard of a work list for this host.

    Round-robin (not contiguous) so size-sorted datasets spread evenly —
    the host-level analog of the reference's batch kernel mapping
    blockIdx.x -> image (parser.cu:663-682)."""
    idx = jax.process_index() if index is None else index
    cnt = jax.process_count() if count is None else count
    return items[idx::cnt]


def allreduce_metrics(metrics: dict[str, float]) -> dict[str, float]:
    """Sum scalar metrics across hosts (DCN collective via a tiny psum)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.array([float(metrics[k]) for k in keys], np.float64)
    total = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, total)}
