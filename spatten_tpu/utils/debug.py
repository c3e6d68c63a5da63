"""Opt-in sanitizer hooks — the TPU analog of SURVEY §5's race/sanitizer
row (TSAN/compute-sanitizer in the reference's CUDA world).

On TPU the failure modes worth trapping are numeric (NaN/Inf escaping a
masked region, div-by-zero in a softmax denominator) and SPMD-consistency
(a logically-replicated value diverging across shards — the collective
analog of a data race).  Three hooks, all opt-in:

* ``debug_mode()`` — context manager enabling ``jax_debug_nans`` (XLA
  re-runs the failing op un-fused and raises at the NaN's source);
* ``checkify_step(fn, *args)`` — run one step under
  ``jax.experimental.checkify`` float checks, raising on NaN/Inf/div0;
* ``replicated_mismatch(x)`` — max abs divergence of a logically-
  replicated array across its addressable shards (0.0 == consistent).

``SPATTEN_DEBUG=1`` makes the engine's generate() wrap its prefill in a
checkified step (cheap — once per call), catching numeric corruption at
the source instead of as garbage tokens.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Callable

import jax
import numpy as np


def enabled() -> bool:
    """True when SPATTEN_DEBUG is set (engine hooks check this)."""
    return bool(os.environ.get("SPATTEN_DEBUG"))


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Scope with jax_debug_nans enabled: any NaN produced inside raises
    with the producing op's location (XLA deoptimizes the fusion)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checkify_step(fn: Callable, *args, **kwargs) -> Any:
    """Run `fn(*args, **kwargs)` under checkify float checks (NaN, Inf,
    div-by-zero); raises JaxRuntimeError at the failing op, returns fn's
    result otherwise."""
    from jax.experimental import checkify
    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = checked(*args, **kwargs)
    err.throw()
    return out


def replicated_mismatch(x: jax.Array) -> float:
    """Max abs difference of a logically-replicated array across its
    addressable shards.  0.0 means every shard holds identical bytes —
    the SPMD consistency invariant for replicated state (lengths, head
    masks, requant counters).  A nonzero value is the collective analog
    of a data race: some shard computed a different value for state the
    program treats as global."""
    if hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
        raise ValueError(
            f"array is sharded ({x.sharding}); replicated_mismatch "
            "checks the consistency of logically-replicated state")
    shards = x.addressable_shards
    if len(shards) <= 1:
        return 0.0
    base = np.asarray(shards[0].data, dtype=np.float64)
    worst = 0.0
    for s in shards[1:]:
        d = np.asarray(s.data, dtype=np.float64)
        worst = max(worst, float(np.max(np.abs(d - base)))
                    if base.size else 0.0)
    return worst
