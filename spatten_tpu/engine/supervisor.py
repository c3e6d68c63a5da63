"""Supervised (restartable) decoding: health check -> restore -> resume.

Composes the pieces SURVEY.md §5 lists separately — the multi-host
heartbeat (`parallel.multihost.health_check`) and the decode-state
checkpoint (`engine.checkpoint`) — into one serving loop: decode runs in
windows; after each window the live state snapshots; before each window
the supervisor runs a health probe, and on failure restores the latest
snapshot and resumes exactly where it left off.  The reference has
neither (its sims abort on assert); restartable decode is what makes the
engine deployable on preemptible TPU pods.

Determinism contract: the resumed run replays the interrupted window
from its snapshot, so the emitted token stream is identical to an
uninterrupted run (greedy or fixed-rng sampling) —
tests/test_supervisor.py kills a window mid-flight and asserts equality.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import SpAttenConfig
from spatten_tpu.engine import checkpoint, generate as gen


def _fresh_start(params, cfg, prompt, b, nwin, window, ckpt_dir,
                 write_snapshot):
    """Prefill + first token + the one-time params checkpoint + the
    initial (cursor 0) snapshot."""
    from spatten_tpu.engine import checkpoint, generate as gen
    state = gen.init_state(cfg, batch=b)
    chunk = cfg.engine.prefill_chunk
    pos = 0
    last_logits = None
    while pos < prompt.shape[1]:
        n = min(chunk, prompt.shape[1] - pos)
        last_logits, state, _ = gen.prefill_chunk(
            params, cfg, state, prompt[:, pos:pos + n])
        pos += n
    token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    # fixed-size emitted buffer + cursor (orbax rejects zero-size arrays)
    emitted = np.zeros((b, nwin * window), np.int32)
    params_path = os.path.join(ckpt_dir, "params")
    if not os.path.exists(params_path):
        checkpoint.save(params_path, params)   # written ONCE
    write_snapshot(0, state,
                   extra={"token": token, "emitted": emitted,
                          "count": np.int32(0),
                          "window": np.int32(window)})
    return state, token, emitted, 0


def generate_supervised(
    params,
    cfg: SpAttenConfig,
    prompt: jax.Array,            # int32 [B, prompt_len]
    max_new_tokens: int,
    ckpt_dir: str,
    *,
    window: int = 32,
    health: Optional[Callable[[], bool]] = None,   # default: all-device
                                  #   heartbeat (multihost.health_check)
    max_restarts: int = 8,
    resume: bool = False,         # True: restore the latest snapshot in
                                  #   ckpt_dir (params from `params/`)
                                  #   and continue — the cross-PROCESS
                                  #   restart path after a host dies
) -> jax.Array:
    """Greedy decode with per-window snapshots and failure recovery.

    Returns int32 [B, max_new_tokens].  Each window of up to `window`
    tokens runs through the same jitted path as `engine.generate`
    (capacity-triggered cascade prune + head-mask update at the window
    boundary); after a window completes, (state, next token, emitted
    tokens) snapshot to `ckpt_dir`.  A failed `health()` probe before a
    window triggers restore-from-latest and the window replays.
    """
    if health is None:
        from spatten_tpu.parallel.multihost import health_check
        health = health_check
    cfg.validate()
    b, _ = prompt.shape
    os.makedirs(ckpt_dir, exist_ok=True)
    marker = os.path.join(ckpt_dir, "LATEST")

    def snap_path(c):
        return os.path.join(ckpt_dir, f"supervised-{c}")

    def write_snapshot(c, state, extra):
        """Write a STATE-ONLY snapshot c (params are immutable and were
        written once to `params/`), publish it in LATEST, drop older
        snapshots (orbax refuses to overwrite, so snapshots rotate by
        cursor)."""
        import shutil
        p = snap_path(c)
        if os.path.exists(p):
            shutil.rmtree(p)
        checkpoint.save(p, None, state, extra=extra)
        with open(marker, "w") as f:
            f.write(str(c))
        for name in os.listdir(ckpt_dir):
            if name.startswith("supervised-") and name != f"supervised-{c}":
                shutil.rmtree(os.path.join(ckpt_dir, name))

    def read_snapshot():
        with open(marker) as f:
            c = int(f.read().strip())
        return checkpoint.restore_with_extra(snap_path(c))

    nwin = -(-max_new_tokens // window)
    if resume and os.path.exists(marker):
        # cross-process restart: weights from the one-time params
        # checkpoint, live state + cursor from the latest snapshot; the
        # interrupted window replays (same determinism contract)
        params, _ = checkpoint.restore(os.path.join(ckpt_dir, "params"))
        _p, state, extra = read_snapshot()
        token = jnp.asarray(extra["token"])
        emitted = np.asarray(extra["emitted"]).astype(np.int32)
        count = int(extra["count"])
        # the restored cursor is a multiple of the WRITER's window; a
        # different resume window would misalign emitted[:, count:] (and
        # can overrun the nwin*window buffer near the budget end)
        snap_window = int(extra.get("window", window))
        if snap_window != window:
            raise ValueError(
                f"resume window {window} != snapshot window {snap_window};"
                " pass the same `window` the interrupted run used")
        # size the buffer from the live cursor, not nwin*window alone:
        # covers both a longer budget on resume and a non-aligned cursor
        need = max(nwin * window, count + window)
        if emitted.shape[1] < need:
            emitted = np.concatenate(
                [emitted, np.zeros((b, need - emitted.shape[1]),
                                   np.int32)], axis=1)
    else:
        state, token, emitted, count = _fresh_start(
            params, cfg, prompt, b, nwin, window, ckpt_dir,
            write_snapshot)



    @jax.jit
    def decode_window(params, state, token, n_arr):
        del n_arr
        state, _ = gen.maybe_prune(cfg, state, window)
        state = gen.maybe_update_head_mask(cfg, state, window=window)

        def body(carry, _):
            state, token = carry
            logits, state, _ = gen.transformer.forward(
                params, cfg, state, token[:, None])
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (state, nxt), token

        (state, token), toks = jax.lax.scan(
            body, (state, token), None, length=window)
        return state, token, toks.T                   # [B, window]

    restarts = 0
    while count < max_new_tokens:
        if not health():
            if restarts >= max_restarts:
                raise RuntimeError(
                    f"supervised decode: {restarts} restarts exhausted")
            restarts += 1
            # snapshots are state-only; the in-memory params are the
            # immutable weights (a cross-process restart restores them
            # from `<ckpt_dir>/params` before calling this function)
            _p, state, extra = read_snapshot()
            token = jnp.asarray(extra["token"])
            emitted = np.asarray(extra["emitted"]).astype(np.int32)
            count = int(extra["count"])
            continue
        state, token, toks = decode_window(params, state, token, None)
        emitted[:, count:count + window] = np.asarray(toks)
        count += window
        write_snapshot(count, state,
                       extra={"token": token, "emitted": emitted,
                              "count": np.int32(count),
                              "window": np.int32(window)})
    return jnp.asarray(emitted[:, :max_new_tokens])
