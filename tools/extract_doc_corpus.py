#!/usr/bin/env python
"""Extract an English-prose corpus from installed packages' docstrings.

The environment has no network access and ships no NLP corpora, but its
site-packages carry ~64 MB of real English documentation prose (numpy,
torch, sklearn, jax, ... docstrings).  This tool mines them into one
plain-text corpus for the from-scratch perplexity experiments
(tools/ppl_curve.py PPL_MODEL=gpt2s) — real natural-language text, not a
synthetic language.

    python tools/extract_doc_corpus.py [out.txt]

Filters: >= 200 chars, >= 40 words, < 4% code-ish characters, deduped.
"""

from __future__ import annotations

import ast
import hashlib
import os
import re
import sys
import sysconfig

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/doc_corpus.txt"
roots = [sysconfig.get_paths()["purelib"]]

word_re = re.compile(r"[A-Za-z]{2,}")
docs, seen, total = [], set(), 0
for root in roots:
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if d not in ("tests", "test", "__pycache__")]
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            try:
                src = open(path, encoding="utf-8",
                           errors="ignore").read()
                tree = ast.parse(src)
            except Exception:
                continue
            for node in ast.walk(tree):
                if not isinstance(node, (ast.Module, ast.ClassDef,
                                         ast.FunctionDef,
                                         ast.AsyncFunctionDef)):
                    continue
                d = ast.get_docstring(node)
                if not d or len(d) < 200:
                    continue
                if len(word_re.findall(d)) < 40:
                    continue
                if sum(c in "={}[]<>_" for c in d) / len(d) > 0.04:
                    continue
                h = hashlib.md5(d.encode()).hexdigest()
                if h in seen:
                    continue
                seen.add(h)
                docs.append(d.strip())
                total += len(d)

with open(out_path, "w") as f:
    f.write("\n\n".join(docs))
print(f"{len(docs)} docstrings, {total / 1e6:.1f} MB -> {out_path}",
      file=sys.stderr)
