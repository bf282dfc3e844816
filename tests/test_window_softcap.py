"""Sliding-window and softcap support IN THE KERNELS — the reference only has
these in its oracle (`src/reference_implementation.py:8-35,87-90`; declared
kernel TODOs at `tests/test_fwd_bwd.py:7-8` there)."""
import pytest

from tests.core import run_attention_case


@pytest.mark.parametrize("window_size", [(32, 0), (0, 16)])
def test_sliding_window(window_size):
    run_attention_case(2, 4, 2, 255, 255, 64, causal=False, window_size=window_size)


def test_sliding_window_causal():
    run_attention_case(2, 4, 2, 255, 255, 64, causal=True, window_size=(64, -1))


@pytest.mark.parametrize("softcap", [30.0, 5.0])
def test_softcap(softcap):
    run_attention_case(2, 4, 2, 128, 128, 64, causal=True, softcap=softcap)


def test_softcap_with_bias():
    run_attention_case(2, 4, 2, 128, 128, 64, causal=False, softcap=20.0, use_bias=True)
