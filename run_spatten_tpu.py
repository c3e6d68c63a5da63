#!/usr/bin/env python
"""SpAtten-TPU demo / serving driver.

The TPU analog of the reference chatbot demo (run_spatten_llama.py:91-144):
loads a local HF checkpoint, enables the SpAtten pipeline (cascade token
pruning + local V pruning + progressive KV quantization + optional head
pruning), and runs multi-turn generation over prompts — plus trace emission
and a metrics summary the reference only produced as ad-hoc prints.

Usage:
  python run_spatten_tpu.py --model_path /path/to/hf_checkpoint \
      [--prompts prompts.jsonl] [--max_new_tokens 256] \
      [--start_size 4 --important_size 384 --recent_size 384] \
      [--cache_capacity 1024] [--disable_quant] [--disable_pruning] \
      [--head_keep 0] [--trace_csv out.csv] [--summary out.json] \
      [--mesh_data 1 --mesh_model 1] [--temperature 0] [--top_p 1.0]

Prompts: a jsonl where each line has {"turns": [...]} (MT-Bench format,
reference data/mt_bench.jsonl) or {"prompt": "..."}; or omit --prompts for
a built-in smoke prompt.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help="local HF checkpoint dir (Llama or GPT-2 family)")
    p.add_argument("--prompts", default=None, help="jsonl prompts file")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--max_prompts", type=int, default=4)
    # pruning knobs (reference defaults: start 0, important 150, recent 150)
    p.add_argument("--start_size", type=int, default=4)
    p.add_argument("--important_size", type=int, default=384)
    p.add_argument("--recent_size", type=int, default=384)
    p.add_argument("--cache_capacity", type=int, default=1024)
    p.add_argument("--v_keep_ratio", type=float, default=0.35)
    p.add_argument("--head_keep", type=int, default=0,
                   help=">0: keep this many kv-head groups per layer")
    p.add_argument("--requant_threshold", type=float, default=0.05)
    p.add_argument("--disable_quant", action="store_true")
    p.add_argument("--disable_pruning", action="store_true")
    p.add_argument("--no_pallas", action="store_true")
    # sampling
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    # mesh
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    # outputs
    p.add_argument("--trace_csv", default=None)
    p.add_argument("--summary", default=None)
    return p.parse_args(argv)


def load_conversations(path, limit):
    """[[turn, turn, ...], ...] — MT-Bench-style multi-turn records (the
    reference demo feeds all turns of a record through one rolling KV
    cache, pruning between rounds, run_spatten_llama.py:60-83)."""
    if path is None:
        return [["The key idea of sparse attention is",
                 "Summarize that in one sentence."]]
    convs = []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            if "turns" in rec:
                convs.append(list(rec["turns"]))
            elif "prompt" in rec:
                convs.append([rec["prompt"]])
            if len(convs) >= limit:
                break
    return convs


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from spatten_tpu.config import (
        EngineConfig, MeshConfig, PruningConfig, QuantConfig, SpAttenConfig,
    )
    from spatten_tpu.engine import generate as gen
    from spatten_tpu.engine.metrics import collect_run_metrics
    from spatten_tpu.engine.sampling import SamplingParams
    from spatten_tpu.models import hf_loader

    print(f"[spatten-tpu] devices: {jax.devices()}")
    mcfg, params = hf_loader.load_pretrained(args.model_path)
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    cfg = SpAttenConfig(
        model=mcfg,
        pruning=PruningConfig(
            start_size=args.start_size,
            important_size=args.important_size,
            recent_size=args.recent_size,
            enable_token_pruning=not args.disable_pruning,
            enable_v_pruning=not args.disable_pruning,
            v_keep_ratio=args.v_keep_ratio,
            enable_head_pruning=args.head_keep > 0,
            head_keep=args.head_keep,
        ),
        quant=QuantConfig(enabled=not args.disable_quant,
                          enable_requant=not args.disable_quant,
                          requant_threshold=args.requant_threshold),
        engine=EngineConfig(
            max_batch_size=1, cache_capacity=args.cache_capacity,
            prefill_chunk=min(
                128, args.cache_capacity - args.start_size
                - args.important_size - args.recent_size)
            if not args.disable_pruning else 128,
            use_pallas=not args.no_pallas,
            mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
        ),
    ).validate()

    sampling = SamplingParams(temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p)

    use_mesh = args.mesh_data * args.mesh_model > 1
    if use_mesh:
        from spatten_tpu.parallel import ShardedEngine, make_mesh
        mesh = make_mesh(cfg.engine.mesh)
        eng = ShardedEngine(cfg, mesh)
        params = eng.shard_params(params)

    convs = load_conversations(args.prompts, args.max_prompts)
    eos = tokenizer.eos_token_id
    all_rows = []
    t_total0 = time.perf_counter()
    for i, turns in enumerate(convs):
        # multi-turn conversation over ONE rolling pruned cache: each
        # round's prompt and reply append to the same DecodeState; the
        # cascade prune fires between/within rounds as capacity demands
        # (the reference demo's between-round apply_token_pruning,
        # run_spatten_llama.py:71-83)
        state = None
        for r, prompt in enumerate(turns):
            ids = tokenizer(prompt,
                            return_tensors="np").input_ids.astype("int32")
            ids = jnp.asarray(ids)
            print(f"\n=== conv {i} round {r}: {prompt[:72]!r} "
                  f"({ids.shape[1]} tokens)")
            t0 = time.perf_counter()
            if use_mesh:
                toks = eng.generate(params, ids, args.max_new_tokens,
                                    eos_token_id=eos)
                result = None
            else:
                result = gen.generate(params, cfg, ids, args.max_new_tokens,
                                      eos_token_id=eos, sampling=sampling,
                                      state=state)
                state = result.state
                toks = result.tokens
            toks_host = jax.device_get(toks)
            dt = time.perf_counter() - t0
            reply = [t for t in toks_host[0].tolist() if t != eos]
            print(tokenizer.decode(reply, skip_special_tokens=True))
            cache_len = (int(jax.device_get(result.state.lengths)[0])
                         if result else "?")
            print(f"--- {toks_host.shape[1] / dt:.1f} tok/s; {dt:.1f}s; "
                  f"cache len {cache_len}")
            if result is not None:
                # feed the reply back so the next round continues the
                # conversation over the pruned cache
                state = result.state
        if args.trace_csv and not use_mesh and i == 0:
            from spatten_tpu.engine.trace import collect_trace
            all_rows = collect_trace(params, cfg, ids, min(
                8, args.max_new_tokens))
        if args.summary and not use_mesh:
            m = collect_run_metrics(cfg, result, len(turns),
                                    int(ids.shape[1]), dt)
            m.write(args.summary)
            print(f"[summary -> {args.summary}] "
                  f"requant_rate={m.requant_rate:.3f} "
                  f"head_keep={m.head_keep_fraction:.2f}")

    if args.trace_csv and all_rows:
        from spatten_tpu.engine.trace import write_csv
        write_csv(all_rows, args.trace_csv)
        print(f"[trace -> {args.trace_csv}] {len(all_rows)} rows")
    print(f"\ntotal {time.perf_counter() - t_total0:.1f}s")


if __name__ == "__main__":
    main()
