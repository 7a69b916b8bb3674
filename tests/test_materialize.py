"""Pallas materialization kernels == XLA butterflies, bit for bit.

The Pallas path (ops/materialize.py) must place exactly the same
coefficients as the XLA compact+spread reference for any event matrix
satisfying the FSM's emission contract: per lane, valid events appear in
row order with strictly increasing targets.
"""

import numpy as np
import pytest

import jax
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
    if jax.default_backend() != "cpu":
        pytest.skip("gating asserts are for the CPU backend")
    monkeypatch.delenv("TPUJPEG_PALLAS", raising=False)
    assert not materialize._use_pallas(1024, 1024, 256)
    monkeypatch.setenv("TPUJPEG_PALLAS", "1")
    assert not materialize._use_pallas(1024, 1024, 256)  # cpu backend


@pytest.mark.parametrize(
    "n_rows,max_blk", [(2304, 64), (2500, 35), (700, 47), (4000, 33)]
)
def test_v3_matches_xla(n_rows, max_blk):
    # shapes straddle the window size: padding of N and M to _W multiples,
    # N > M truncation, and multi-window grids are all exercised
    rng = np.random.default_rng(n_rows)
    L = 128
    M = max_blk * 64
    ev, want = _random_events(rng, n_rows, max_blk, L, 0.25)
    ev[:, 0] = -1  # fully-empty lane
    want[:, 0] = 0
    got = np.asarray(
        materialize.place_events_v3(jnp.asarray(ev), M=M, interpret=True)
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(_xla_place(ev, M), want)


def test_v3_gating(monkeypatch):
    # default-on for TPU backends only, bounded by int16 offsets
    if jax.default_backend() == "cpu":
        assert not materialize._use_pallas_v3(7680, 16384, 2560)  # cpu backend
    else:
        assert materialize._use_pallas_v3(7680, 16384, 2560)
        assert not materialize._use_pallas_v3(7680, 40000, 2560)  # int16 bound
    monkeypatch.setenv("TPUJPEG_PALLAS_V3", "0")
    assert not materialize._use_pallas_v3(7680, 16384, 2560)


def test_v3_compiled_on_chip():
    # Mosaic lowering limits are invisible to interpret mode: when the
    # real chip is available, the COMPILED kernels must match exactly
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip (TPUJPEG_TEST_TPU=1)")
    rng = np.random.default_rng(42)
    n_rows, max_blk, L = 2304, 40, 256
    M = max_blk * 64
    ev, want = _random_events(rng, n_rows, max_blk, L, 0.25)
    got = np.asarray(
        materialize.place_events_v3(jnp.asarray(ev), M=M)
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)

@pytest.mark.parametrize("kc", [2, 3, 4])
@pytest.mark.parametrize("n_rows,max_blk", [(4000, 80), (2500, 35)])
def test_v3_wider_span_matches_xla(kc, n_rows, max_blk):
    # the multi-window stacks (stages d < kc*W in one kernel) must be
    # bit-identical to the kc=1 shape and the XLA network; kc=3 exercises
    # the power-of-two clamp in _span_for
    rng = np.random.default_rng(1000 + kc + n_rows)
    L = 128
    M = max_blk * 64
    ev, want = _random_events(rng, n_rows, max_blk, L, 0.25)
    got = np.asarray(
        materialize.place_events_v3(jnp.asarray(ev), M=M, interpret=True,
                                    kc=kc)
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Slot spread (round 5): compressed-coordinate materialization
# ---------------------------------------------------------------------------


def _block_events(rng, n_rows, max_blk, L, mean_ev, heavy=()):
    """Decode-realistic events: per block, a random set of distinct
    ascending zigzag positions (the FSM emission contract).  `heavy`
    lanes get one group stuffed past any capacity.  Returns (ev, want,
    expected per-lane overflow for the module's C/G)."""
    C, G = materialize._SLOT_C, materialize._SLOT_G
    ev = np.full((n_rows, L), -1, np.int32)
    want = np.zeros((max_blk * 64, L), np.int32)
    ovf = np.zeros(L, bool)
    for lane in range(L):
        rows = []
        gcnt = {}
        for b in range(max_blk):
            n = min(64, int(rng.poisson(mean_ev)))
            if lane in heavy and b < G:
                n = 64  # G*64 > C for any C < 64G
            if not n:
                continue
            gcnt[b // G] = gcnt.get(b // G, 0) + n
            for z in np.sort(rng.choice(64, n, replace=False)):
                v = int(rng.integers(1, 2047)) * (1 if rng.random() < .5
                                                  else -1)
                rows.append((b, int(z), v))
                want[b * 64 + z, lane] = v
        ovf[lane] = any(c > C for c in gcnt.values())
        assert len(rows) <= n_rows
        pos = np.sort(rng.choice(n_rows, len(rows), replace=False))
        for p, (b, z, v) in zip(pos, rows):
            ev[p, lane] = (b << 18) | (z << 12) | (v + 2048)
    return ev, want, ovf


@pytest.mark.parametrize("n_rows,max_blk,mean_ev", [
    (2600, 60, 20),     # Msp == 2W floor
    (2100, 33, 4),      # sparse, slot space padded past rank space
    (4200, 120, 26),    # dense, Np > Msp truncation branch
])
def test_slots_match_truth(n_rows, max_blk, mean_ev):
    rng = np.random.default_rng(n_rows + max_blk)
    L = 128
    M = max_blk * 64
    ev, want, ovf_want = _block_events(rng, n_rows, max_blk, L, mean_ev)
    dense, ovf = materialize.place_events_slots(
        jnp.asarray(ev), M=M, interpret=True
    )
    dense, ovf = np.asarray(dense).astype(np.int32), np.asarray(ovf)
    np.testing.assert_array_equal(ovf, ovf_want)
    ok = ~ovf_want
    np.testing.assert_array_equal(dense[:, ok], want[:, ok])


def test_slots_overflow_latch_is_per_lane():
    # a stuffed group must latch ONLY its lane; every other lane stays
    # bit-exact (the batch engine retries latched chunks classically)
    rng = np.random.default_rng(7)
    n_rows, max_blk, L = 2600, 60, 128
    M = max_blk * 64
    ev, want, ovf_want = _block_events(
        rng, n_rows, max_blk, L, 10, heavy=(3, 77)
    )
    assert ovf_want[3] and ovf_want[77] and ovf_want.sum() == 2
    dense, ovf = materialize.place_events_slots(
        jnp.asarray(ev), M=M, interpret=True
    )
    dense, ovf = np.asarray(dense).astype(np.int32), np.asarray(ovf)
    np.testing.assert_array_equal(ovf, ovf_want)
    ok = ~ovf_want
    np.testing.assert_array_equal(dense[:, ok], want[:, ok])


def test_slots_gating(monkeypatch):
    if jax.default_backend() == "cpu":
        assert not materialize._use_pallas_slots(7680, 15360, 5120)
    else:
        assert materialize._use_pallas_slots(7680, 15360, 5120)
        # slot space: ceil(max_blk/G)*C*32 <= 32768 blocks bound
        assert not materialize._use_pallas_slots(7680, 70000 * 64, 5120)
    monkeypatch.setenv("TPUJPEG_SLOTS", "0")
    assert not materialize._use_pallas_slots(7680, 15360, 5120)


def test_slots_compiled_on_chip():
    # Mosaic lowering limits are invisible to interpret mode: the
    # compiled slot kernels must match exactly on the real chip
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip (TPUJPEG_TEST_TPU=1)")
    rng = np.random.default_rng(43)
    n_rows, max_blk, L = 2600, 60, 256
    M = max_blk * 64
    ev, want, ovf_want = _block_events(rng, n_rows, max_blk, L, 18,
                                       heavy=(9,))
    dense, ovf = materialize.place_events_slots(jnp.asarray(ev), M=M)
    dense, ovf = np.asarray(dense).astype(np.int32), np.asarray(ovf)
    np.testing.assert_array_equal(ovf, ovf_want)
    ok = ~ovf_want
    np.testing.assert_array_equal(dense[:, ok], want[:, ok])


def test_slots_c128_matches_truth():
    # content-adaptive capacity: C=128 halves the slot space again on
    # sparse corpora; its narrower spread window (Ws=512, dense frame
    # capped at 2048 rows) must stay bit-exact
    rng = np.random.default_rng(11)
    n_rows, max_blk, L = 2600, 60, 128
    M = max_blk * 64
    ev, want, _ = _block_events(rng, n_rows, max_blk, L, 8)
    # recompute overflow for C=128
    G = materialize._SLOT_G
    dense, ovf = materialize.place_events_slots(
        jnp.asarray(ev), M=M, C=128, interpret=True
    )
    dense, ovf = np.asarray(dense).astype(np.int32), np.asarray(ovf)
    cnt = (want != 0).reshape(-1, 64, L).sum(1)        # [max_blk, L]
    pad = (-len(cnt)) % G
    if pad:
        cnt = np.concatenate([cnt, np.zeros((pad, L), cnt.dtype)])
    ovf_want = (cnt.reshape(-1, G, L).sum(1) > 128).any(0)
    np.testing.assert_array_equal(ovf, ovf_want)
    ok = ~ovf_want
    np.testing.assert_array_equal(dense[:, ok], want[:, ok])


def test_slots_msp_taller_than_np():
    # photo-like shape: short scans (small N) with a tall block space —
    # slot space pads PAST the rank space (fit()'s concatenate branch),
    # and spread targets exceed every rank row.  First seen live on the
    # photo-corpus bench; must be covered at interpret level.
    rng = np.random.default_rng(21)
    n_rows, max_blk, L = 2100, 120, 128
    M = max_blk * 64
    ev, want, ovf_want = _block_events(rng, n_rows, max_blk, L, 3)
    assert not ovf_want.any()
    dense, ovf = materialize.place_events_slots(
        jnp.asarray(ev), M=M, interpret=True
    )
    assert not np.asarray(ovf).any()
    np.testing.assert_array_equal(
        np.asarray(dense).astype(np.int32), want
    )
