from fa2_triton_tpu.runtime.kv_cache import KVCacheConfig, init_cache, write_kv
from fa2_triton_tpu.runtime.sampling import SamplingParams
from fa2_triton_tpu.runtime.serving import Engine, Request, EngineStats
from fa2_triton_tpu.runtime.speculative import SpeculativeDecoder

__all__ = ["KVCacheConfig", "init_cache", "write_kv", "Engine", "Request", "EngineStats", "SamplingParams", "SpeculativeDecoder"]
