"""Continuous-batching serving engine: a slot-based KV arena.

The TPU analog of the reference's BufferManager ring allocator
(BufferManager.scala:33-187 — alloc at tail, out-of-order release,
recycle): the decode state's batch dimension is an arena of `max_batch_size`
slots.  Requests are admitted into free slots, decode steps advance every
occupied slot in lockstep (one jitted program, static shapes), and finished
slots are released out-of-order and recycled.

Admission is **overlapped**: a new request's prompt prefills one chunk per
scheduler step, interleaved with the arena's decode steps, so a long
prompt never stalls running decodes — the per-step decode latency is
bounded by one prefill chunk (the chunked-prefill co-scheduling that
continuous batching exists for; the reference's BufferManager likewise
overlaps new-buffer fills with in-flight compute, BufferManager.scala:96-184).
When nothing is decoding, all pending chunks run back-to-back.

All XLA programs involved are the same two compiled steps the plain
`generate` path uses — admission and release are host-side bookkeeping
plus one scatter, so continuous batching adds no new compilation.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatten_tpu.config import SpAttenConfig
import spatten_tpu.engine.generate as gen
from spatten_tpu.engine.state import DecodeState, init_state, write_slot


@dataclass
class Request:
    request_id: int
    prompt: np.ndarray                 # int32 [prompt_len]
    max_new_tokens: int
    generated: List[int] = field(default_factory=list)
    slot: Optional[int] = None
    next_token: Optional[int] = None
    done: bool = False


@dataclass
class _Admission:
    """A request whose prompt is being prefilled, one chunk per step."""

    req: Request
    slot: int                          # reserved arena slot
    sub: DecodeState                   # private batch-1 state
    pos: int = 0
    last_logits: Optional[jax.Array] = None


class SpAttenServer:
    """Host-side scheduler over the jitted prefill/decode steps."""

    def __init__(self, params, cfg: SpAttenConfig,
                 eos_token_id: Optional[int] = None):
        cfg.validate()
        self.params = params
        self.cfg = cfg
        self.eos = eos_token_id
        self.batch = cfg.engine.max_batch_size
        self.state = init_state(cfg, batch=self.batch)
        self.free_slots = list(range(self.batch))
        self.active: Dict[int, Request] = {}     # slot -> request
        self.admitting: List[_Admission] = []    # slot reserved, prefilling
        self.pending: List[Request] = []
        self.finished: List[Request] = []
        self._ids = itertools.count()
        self._write_slot = jax.jit(write_slot, donate_argnums=(0,))

    # -- client API ---------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int) -> int:
        """Queue a request; returns its id."""
        req = Request(request_id=next(self._ids),
                      prompt=np.asarray(prompt, np.int32).reshape(-1),
                      max_new_tokens=max_new_tokens)
        self.pending.append(req)
        return req.request_id

    def step(self) -> List[Request]:
        """One scheduler tick: start admissions, advance each in-flight
        prefill by ONE chunk, run one arena decode step over the active
        slots, release finished.  Returns requests completed this tick.

        Decode never waits for a whole prompt: a long admission costs each
        tick one chunk of prefill alongside the decode step.  With no
        active decodes the tick still advances admissions, so pure-prefill
        phases make full progress."""
        self._start_admissions()
        self._advance_admissions()

        if not self.active:
            return self._drain_finished()

        # one lockstep decode over the arena; empty slots compute garbage
        # that is never read (their outputs are ignored and their cache is
        # overwritten on admission)
        tokens = np.zeros((self.batch,), np.int32)
        for slot, req in self.active.items():
            tokens[slot] = req.next_token
        next_tokens, self.state, _ = gen.decode_step(
            self.params, self.cfg, self.state, jnp.asarray(tokens))
        next_tokens = np.asarray(jax.device_get(next_tokens))

        for slot in list(self.active):
            req = self.active[slot]
            req.generated.append(int(req.next_token))
            emitted = len(req.generated)
            nxt = int(next_tokens[slot])
            if (self.eos is not None and req.next_token == self.eos) or \
                    emitted >= req.max_new_tokens:
                req.done = True
                self.finished.append(req)
                del self.active[slot]
                self.free_slots.append(slot)     # out-of-order release
            else:
                req.next_token = nxt
        return self._drain_finished()

    def run_to_completion(self, max_steps: int = 10_000) -> List[Request]:
        out: List[Request] = []
        for _ in range(max_steps):
            out.extend(self.step())
            if not self.active and not self.pending and not self.admitting:
                break
        return out

    # -- internals ----------------------------------------------------------

    def _start_admissions(self) -> None:
        """Reserve slots for pending requests (no prefill work here)."""
        while self.pending and self.free_slots:
            req = self.pending.pop(0)
            slot = self.free_slots.pop(0)
            self.admitting.append(_Admission(
                req=req, slot=slot, sub=init_state(self.cfg, batch=1)))

    def _advance_admissions(self) -> None:
        """Run ONE prefill chunk for every in-flight admission; scatter
        completed prefills into their reserved arena slots."""
        chunk = self.cfg.engine.prefill_chunk
        still: List[_Admission] = []
        for adm in self.admitting:
            prompt = adm.req.prompt
            n = min(chunk, len(prompt) - adm.pos)
            ids = jnp.asarray(prompt[None, adm.pos:adm.pos + n])
            adm.last_logits, adm.sub, _ = gen.prefill_chunk(
                self.params, self.cfg, adm.sub, ids)
            adm.pos += n
            if adm.pos < len(prompt):
                still.append(adm)
                continue
            first = int(np.asarray(jax.device_get(
                jnp.argmax(adm.last_logits, axis=-1)))[0])
            self.state = self._write_slot(self.state, adm.sub,
                                          jnp.int32(adm.slot))
            adm.req.slot = adm.slot
            adm.req.next_token = first
            self.active[adm.slot] = adm.req
        self.admitting = still

    def _drain_finished(self) -> List[Request]:
        out, self.finished = self.finished, []
        return out
