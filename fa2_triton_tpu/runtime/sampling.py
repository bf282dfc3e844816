"""On-device token sampling for the serving engine.

The reference has no serving layer; this rounds out the engine's north-star
surface: per-request temperature / top-k / top-p (nucleus) sampling,
executed INSIDE the jitted prefill/decode steps (the engine's one-sync-per-
step contract means logits never reach the host), with a counter-based seed
scheme — token i of a request is drawn from
`fold_in(PRNGKey(seed), i)` — so a given (seed, position) always yields the
same token: re-running a request reproduces it bitwise, and a preempted
request that re-prefills its partial generation resumes the identical
stream (the paged engine's preemption contract, `serving.py:_preempt`).

temperature == 0 is greedy (argmax), the engine default.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling controls. Defaults reproduce greedy decode."""
    temperature: float = 0.0   # 0 => argmax
    top_k: int = 0             # 0 => disabled
    top_p: float = 1.0         # 1.0 => disabled
    seed: int = 0

    def __post_init__(self):
        assert self.temperature >= 0.0, self.temperature
        assert self.top_k >= 0, self.top_k
        assert 0.0 < self.top_p <= 1.0, self.top_p


GREEDY = SamplingParams()


def adjust_logits_row(logits, temp, top_k, top_p):
    """Temperature-scale then top-k/top-p-truncate one logits row [V].

    Returns f32 logits with -inf at truncated entries; `softmax` of the
    result is the distribution the sampler actually draws from. Shared by
    the engine sampler below and speculative sampling's accept/reject test
    (`runtime/speculative.py`), which must score proposals under exactly
    the distribution the draft/target would sample from.
    """
    V = logits.shape[-1]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)

    # Top-k: drop everything below the k-th largest logit (0 = off).
    desc = jnp.sort(scaled)[::-1]
    kth = jnp.where(top_k > 0, desc[jnp.clip(top_k - 1, 0, V - 1)], -jnp.inf)
    scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)

    # Top-p: keep the smallest prefix of the sorted distribution whose mass
    # reaches top_p (the token crossing the threshold stays in).
    probs = jax.nn.softmax(scaled)
    sp = jnp.sort(probs)[::-1]
    csum = jnp.cumsum(sp)
    # Clamp the threshold to the actual total mass: float cumsum can land
    # just under 1.0, and an uncrossed `argmax(csum >= top_p)` would return
    # index 0 — silently collapsing top_p=1.0 to greedy (and making the
    # draw flip on 1e-6 logit noise, e.g. between TP and single-device).
    thresh = jnp.minimum(top_p, csum[-1])
    cutoff = sp[jnp.argmax(csum >= thresh)]
    # top_p >= 1.0 means OFF exactly: float cumsum can also OVERSHOOT 1.0
    # mid-vector, which would truncate genuinely-sampleable tail tokens.
    return jnp.where(jnp.logical_or(top_p >= 1.0, probs >= cutoff),
                     scaled, -jnp.inf)


def _sample_row(logits, temp, top_k, top_p, key):
    """One row [V] -> sampled token (greedy when temp == 0)."""
    greedy = jnp.argmax(logits)
    scaled = adjust_logits_row(logits, temp, top_k, top_p)
    tok = jax.random.categorical(key, scaled)
    return jnp.where(temp <= 0.0, greedy, tok).astype(jnp.int32)


def sample_tokens(
    logits: jax.Array,   # [B, V]
    temps: jax.Array,    # [B] f32, 0 = greedy
    top_ks: jax.Array,   # [B] i32, 0 = off
    top_ps: jax.Array,   # [B] f32, 1 = off
    seeds: jax.Array,    # [B] u32/i32 per-request seeds
    steps: jax.Array,    # [B] i32 tokens generated so far (counter)
) -> jax.Array:
    """Batched per-slot sampling; each slot draws from its own
    (seed, step)-keyed stream, independent of what else is co-batched."""
    keys = jax.vmap(
        lambda s, t: jax.random.fold_in(jax.random.PRNGKey(s), t)
    )(seeds.astype(jnp.uint32), steps)
    return jax.vmap(_sample_row)(logits, temps, top_ks, top_ps, keys)


def sample_tokens_with_logprobs(logits, temps, top_ks, top_ps, seeds, steps):
    """`sample_tokens` + each chosen token's logprob under the RAW model
    distribution (temperature/truncation-independent — the scoring
    convention: what the model assigned, not what the sampler reshaped)."""
    toks = sample_tokens(logits, temps, top_ks, top_ps, seeds, steps)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return toks, jnp.take_along_axis(logp, toks[:, None], axis=-1)[:, 0]


def greedy_tokens_with_logprobs(logits):
    """Argmax per row + the chosen token's raw-model logprob — the decode
    fast path when every active request is greedy (no sorts, no RNG)."""
    toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return toks, jnp.take_along_axis(logp, toks[:, None], axis=-1)[:, 0]
