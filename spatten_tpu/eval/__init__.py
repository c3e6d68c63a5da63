"""Accuracy evaluation harnesses.

The reference's perplexity eval was never released (README.md:104-108 TODO;
vestigial argparse at spatten_llm/utils.py:14-48) — this package implements
it: teacher-forced perplexity under the pruned/quantized engine, for
measuring the ppl delta of SpAtten pruning at given ratios.
"""

from spatten_tpu.eval.perplexity import evaluate_perplexity

__all__ = ["evaluate_perplexity"]
