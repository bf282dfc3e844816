"""Speculative decoding (`runtime/speculative.py`).

Contracts: the emitted stream EQUALS the target model's greedy decode for
any draft model; a perfect draft (draft == target) accepts every proposal
and emits gamma+1 tokens per target pass; stats book-keeping is consistent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fa2_triton_tpu.models import LlamaConfig, init_params
from fa2_triton_tpu.runtime.speculative import (
    SpeculativeDecoder, greedy_reference,
)

TCFG = LlamaConfig(
    vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
    hidden_dim=128, max_seq_len=256, dtype=jnp.float32,
)
DCFG = LlamaConfig(
    vocab_size=128, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
    hidden_dim=64, max_seq_len=256, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tparams():
    return init_params(jax.random.PRNGKey(0), TCFG)


@pytest.fixture(scope="module")
def dparams():
    return init_params(jax.random.PRNGKey(1), DCFG)


def test_perfect_draft_accepts_everything(tparams):
    prompt = list(range(5, 14))
    n_new = 13
    ref = greedy_reference(tparams, TCFG, prompt, n_new, max_seq=256)
    dec = SpeculativeDecoder(tparams, TCFG, tparams, TCFG, gamma=3,
                             max_seq=256)
    out, stats = dec.generate(prompt, n_new)
    assert out == ref, (out, ref)
    # draft == target: every proposal verified, gamma+1 tokens per pass
    # (modulo the final truncated round).
    assert stats.acceptance_rate == 1.0
    assert stats.target_calls == -(-(n_new - 1) // (dec.gamma + 1))


def test_weak_draft_still_exact(tparams, dparams):
    """An unrelated (randomly initialized) draft must not change the output
    stream — only the speedup."""
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    n_new = 12
    ref = greedy_reference(tparams, TCFG, prompt, n_new, max_seq=256)
    for gamma in (1, 4):
        dec = SpeculativeDecoder(tparams, TCFG, dparams, DCFG, gamma=gamma,
                                 max_seq=256)
        out, stats = dec.generate(prompt, n_new)
        assert out == ref, (gamma, out, ref)
        assert stats.emitted == n_new
        assert 0.0 <= stats.acceptance_rate <= 1.0
        # Every round emits at least the target's own token.
        assert stats.emitted >= stats.rounds


def test_eos_truncates_mid_round(tparams):
    prompt = list(range(7))
    ref = greedy_reference(tparams, TCFG, prompt, 12, max_seq=256)
    eos = ref[4]
    want = ref[: ref.index(eos) + 1]
    dec = SpeculativeDecoder(tparams, TCFG, tparams, TCFG, gamma=4,
                             max_seq=256, eos_id=eos)
    out, _ = dec.generate(prompt, 12)
    assert out == want, (out, want)
