from fa2_triton_tpu.models.llama import (
    LlamaConfig,
    init_params,
    forward,
    loss_fn,
    init_kv_cache,
    forward_with_cache,
)

__all__ = [
    "LlamaConfig", "init_params", "forward", "loss_fn",
    "init_kv_cache", "forward_with_cache",
]
