"""Skew fallback: a tunneled TPU client can initialize fine yet fail at
the FIRST transfer (the libtpu client/terminal version skew that killed
MULTICHIP_r01/r02). The CLI must degrade to the CPU platform and answer
correctly, not crash — dispatch._put catches the failed default
device_put, pins staging to the CPU device, and backend_name() routes
to the XLA path from then on."""

import jax
import numpy as np
import pytest

from krep_tpu import SearchParams, search_string
from krep_tpu.ops import dispatch


@pytest.fixture
def skewed(monkeypatch):
    orig = jax.device_put

    def failing_default_put(x, device=None, *a, **k):
        if device is None:
            raise RuntimeError("simulated skew: transfer to default backend")
        return orig(x, device, *a, **k)

    monkeypatch.setattr(jax, "device_put", failing_default_put)
    monkeypatch.setattr(dispatch, "_SKEW_CPU", False)
    # conftest pins KREP_TPU_BACKEND=xla for CPU runs, which would satisfy
    # the backend_name() assertion without ever consulting _SKEW_CPU —
    # force auto mode so the skew routing branch itself is exercised
    monkeypatch.setenv("KREP_TPU_BACKEND", "auto")
    yield
    dispatch._SKEW_CPU = False


def test_search_survives_transfer_skew(skewed, capsys):
    text = b"the cat\nbat the hat\nno match\n" * 50
    p = SearchParams(patterns=(b"the",), count_mode=True)
    r = search_string(p, text)
    assert r.count == 100
    assert dispatch._SKEW_CPU is True
    assert dispatch.backend_name() == "xla"
    err = capsys.readouterr().err
    assert "falling back to the CPU platform" in err


def test_positions_survive_transfer_skew(skewed):
    text = b"abc the xyz the\n" * 20
    p = SearchParams(patterns=(b"the",), only_matching=True)
    r = search_string(p, text)
    assert r.count == 40
    starts = np.asarray(r.positions)[:, 0]
    assert int(starts[0]) == 4 and int(starts[1]) == 12
