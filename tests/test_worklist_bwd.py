"""Work-list fused backward (`flash_bwd.flash_attn_backward_fused_wl`):
host-built SMEM schedule driving the 5-matmul fused tile math. Parity vs the
default dispatch across the schedule features: single/multi strip (whole-dq
VMEM accumulation), GQA groups, windows (banded — left-of-window tiles never
enter the table), padded tails, dropout."""
import jax
import jax.numpy as jnp
import pytest

from fa2_triton_tpu.ops.flash_bwd import (
    build_causal_bwd_worklist,
    flash_attn_backward,
    flash_attn_backward_fused_wl,
    WL_COMPUTE, WL_INIT_DQ, WL_INIT_KV, WL_MASK_GEN, WL_MASK_TRI,
    WL_WRITE_DQ, WL_WRITE_KV,
)
from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward


def _run(B, Hq, Hkv, S, D, window=(-1, -1), block_kv=None, sub=256,
         sq_real=None, dropout_p=0.0):
    sq_real = sq_real or S
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32) * 0.5
    do = jax.random.normal(ks[3], (B, Hq, S, D), jnp.float32) * 0.5
    lens = jnp.broadcast_to(jnp.array([[sq_real, sq_real]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 7, 0]], jnp.int32)
    scale = D ** -0.5
    o, lse = flash_attn_forward(
        q, k, v, lens, scal, None, causal=True, softmax_scale=scale,
        window=window, dropout_p=dropout_p,
        seqlen_q_real=sq_real, seqlen_k_real=sq_real, static_skip=True)
    got = flash_attn_backward_fused_wl(
        q, k, v, do, o, lse, lens, scal, causal=True, softmax_scale=scale,
        window=window, sub=sub, block_kv=block_kv, dropout_p=dropout_p,
        seqlen_q_real=sq_real, seqlen_k_real=sq_real)
    want = flash_attn_backward(
        q, k, v, do, o, lse, lens, scal, None, causal=True,
        softmax_scale=scale, window=window, dropout_p=dropout_p,
        seqlen_q_real=sq_real, seqlen_k_real=sq_real, static_skip=True)[:3]
    for g, w, name in zip(got, want, ("dq", "dk", "dv")):
        err = float(jnp.max(jnp.abs(g - w)))
        assert err < 2e-5, (name, err)


@pytest.mark.parametrize("case", [
    dict(B=2, Hq=4, Hkv=4, S=1024, D=128),
    dict(B=2, Hq=4, Hkv=2, S=1024, D=128),                    # GQA
    dict(B=2, Hq=4, Hkv=4, S=1024, D=128, window=(256, -1)),  # banded window
    dict(B=2, Hq=4, Hkv=4, S=1024, D=128, block_kv=512),      # whole-dq
    dict(B=2, Hq=4, Hkv=4, S=1024, D=128, sq_real=900),       # padded tail
    dict(B=2, Hq=4, Hkv=4, S=512, D=128, dropout_p=0.1),
    dict(B=2, Hq=4, Hkv=4, S=1024, D=128, window=(256, -1), block_kv=512),
])
def test_worklist_bwd_parity(case):
    _run(**case)


def test_worklist_schedule_invariants():
    """Structural checks on the builder: every (g, row) gets exactly one
    init/write in per-row mode, strips init/write exactly once, windows drop
    out-of-band tiles, masked flags only where the diagonal/edges bite."""
    nq, bq, sub, nws = 8, 256, 256, 8
    wl = build_causal_bwd_worklist(nq, bq, sub, nws, nsub_strip=8,
                                   group=2, shift=0, tri_ok=True)
    steps = wl.tolist()
    # Causal tile count: group * nq*(nq+1)/2.
    assert len(steps) == 2 * nq * (nq + 1) // 2
    for g in range(2):
        for iq in range(nq):
            mine = [s for s in steps if s[0] == g and s[1] == iq]
            assert len(mine) == iq + 1
            assert sum(bool(s[3] & WL_INIT_DQ) for s in mine) == 1
            assert sum(bool(s[3] & WL_WRITE_DQ) for s in mine) == 1
            # Exactly one tri-masked diagonal tile per row, at ws == iq.
            tri = [s for s in mine if s[3] & WL_MASK_TRI]
            assert len(tri) == 1 and tri[0][2] == iq
            assert not any(s[3] & WL_MASK_GEN for s in mine)
    assert sum(bool(s[3] & WL_INIT_KV) for s in steps) == 1
    assert sum(bool(s[3] & WL_WRITE_KV) for s in steps) == 1
    assert all(s[3] & WL_COMPUTE for s in steps)

    # Banded window: left-of-window tiles never enter the table.
    wlw = build_causal_bwd_worklist(nq, bq, sub, nws, nsub_strip=8,
                                    group=1, shift=0, window=(512, -1),
                                    tri_ok=True)
    for g, iq, ws, flags, strip, *_ in wlw.tolist():
        assert ws * sub >= iq * bq - 512, "tile left of the window scheduled"
        assert ws * sub <= iq * bq + bq - 1
    # Row 7 (rows 1792..2047, window-left 512): band = tiles 5..7 only.
    assert len([s for s in wlw.tolist() if s[1] == 7]) == 3

    # Multi-strip whole-dq mode: one global init/write for dq, one
    # init/write per strip for dk/dv.
    wlm = build_causal_bwd_worklist(nq, bq, sub, nws, nsub_strip=4,
                                    group=1, shift=0, tri_ok=True,
                                    dq_whole=True)
    s = wlm.tolist()
    assert sum(bool(x[3] & WL_INIT_DQ) for x in s) == 1 and \
        bool(s[0][3] & WL_INIT_DQ)
    assert sum(bool(x[3] & WL_WRITE_DQ) for x in s) == 1 and \
        bool(s[-1][3] & WL_WRITE_DQ)
    assert sum(bool(x[3] & WL_INIT_KV) for x in s) == 2
    assert sum(bool(x[3] & WL_WRITE_KV) for x in s) == 2
    # Strip-major order (dk/dv scratch ownership).
    strips = [x[4] for x in s]
    assert strips == sorted(strips)
