"""Model families served by the engine: Llama-class (RoPE/RMSNorm/SwiGLU,
incl. GQA) and GPT-2-class (learned positions/LayerNorm/GELU) — the two
families the reference exercises (Llama in its LLM plane, GPT-2 in its
hardware workload traces).
"""

from spatten_tpu.models.transformer import (
    init_params,
    forward,
    num_params,
)
from spatten_tpu.models import hf_loader

__all__ = ["init_params", "forward", "num_params", "hf_loader"]
