"""Pallas materialization kernels == XLA butterflies, bit for bit.

The Pallas path (ops/materialize.py) must place exactly the same
coefficients as the XLA compact+spread reference for any event matrix
satisfying the FSM's emission contract: per lane, valid events appear in
row order with strictly increasing targets.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpujpeg.ops import fsm, materialize


def _random_events(rng, n_rows, max_blk, L, density):
    """Packed event matrix honoring the per-lane ordering contract."""
    M = max_blk * 64
    ev = np.full((n_rows, L), -1, np.int32)
    want = np.zeros((M, L), np.int32)
    for lane in range(L):
        k = min(int(rng.binomial(n_rows, density)), M, n_rows)
        rows = np.sort(rng.choice(n_rows, size=k, replace=False))
        targets = np.sort(rng.choice(M, size=k, replace=False))
        vals = rng.integers(1, 2047, k) * rng.choice([-1, 1], k)
        for r, t, v in zip(rows, targets, vals):
            blk, z = divmod(int(t), 64)
            ev[r, lane] = (blk << 18) | (z << 12) | (int(v) + 2048)
            want[t, lane] = v
    return ev, want


def _xla_place(ev, M):
    ev = jnp.asarray(ev)
    valid = ev >= 0
    cv, cp = fsm._compact(valid, ev)
    blk = (cp >> 18) & 0x1FFF
    z = (cp >> 12) & 63
    val = (cp & 0xFFF) - 2048
    return np.asarray(fsm._spread(cv, val, blk * 64 + z, M))


@pytest.mark.parametrize("density", [0.0, 0.15, 0.6])
def test_pallas_matches_xla_and_truth(density):
    rng = np.random.default_rng(int(density * 100) + 1)
    n_rows, max_blk, L = 96, 2, 128
    M = max_blk * 64
    ev, want = _random_events(rng, n_rows, max_blk, L, density)
    got_xla = _xla_place(ev, M)
    np.testing.assert_array_equal(got_xla, want)
    got_pl = np.asarray(
        materialize.place_events_pallas(jnp.asarray(ev), M=M, interpret=True)
    ).astype(np.int32)
    np.testing.assert_array_equal(got_pl, want)


def test_pallas_taller_than_M():
    # N > M exercises the truncation branch of the spread kernel
    rng = np.random.default_rng(7)
    n_rows, max_blk, L = 192, 2, 128
    M = max_blk * 64
    ev, want = _random_events(rng, n_rows, max_blk, L, 0.3)
    got = np.asarray(
        materialize.place_events_pallas(jnp.asarray(ev), M=M, interpret=True)
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_use_pallas_gating(monkeypatch):
    # experiment is opt-in, and even then never on CPU backends
    monkeypatch.delenv("TPUJPEG_PALLAS", raising=False)
    assert not materialize._use_pallas(1024, 1024, 256)
    monkeypatch.setenv("TPUJPEG_PALLAS", "1")
    assert not materialize._use_pallas(1024, 1024, 256)  # cpu backend