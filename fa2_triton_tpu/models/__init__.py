from fa2_triton_tpu.models import gpt2
from fa2_triton_tpu.models.llama import (
    LlamaConfig,
    init_params,
    forward,
    loss_fn,
    init_kv_cache,
    forward_with_cache,
)
from fa2_triton_tpu.models.gpt2 import GPT2Config
from fa2_triton_tpu.models import convert, lora, moe
from fa2_triton_tpu.models.moe import MoEConfig

__all__ = [
    "LlamaConfig", "init_params", "forward", "loss_fn",
    "init_kv_cache", "forward_with_cache", "GPT2Config", "gpt2",
    "moe", "MoEConfig", "lora", "convert",
]
