"""Fused per-chunk decode: FSM -> materialize -> assemble -> pixels, ONE
XLA program.

The three-program chain (fsm._decode_jit, fsm.assemble_batched, the pixel
program) costs more than its compute on this platform: each dispatch pays
a few ms of host->device queueing over the tunnel, and the hand-offs
round-trip the dense coefficient tensor through HBM twice at int32 width
(~630 MB per 64-image chunk).  This module compiles the whole chunk into
one jitted program instead (the TPU answer to the reference's single
fused `decodeKernel`, cuda-decoder/src/parser.cu:577-661, but covering
entropy decode too, which the reference runs in a separate kernel):

  * the FSM scan and butterfly materialization run exactly as in
    fsm._decode_jit;
  * the dense tensor stays **int16** from the spread through assembly —
    the pixel stage's first transpose reads half the bytes;
  * DC stays as DPCM differences in the dense tensor; the resolved
    predictors ride a separate [L, max_blk] cumsum and substitute into
    the dequant's DC plane (pipeline._idct_planar dc=), replacing a
    full-tensor rewrite with a 1/64th-sized side channel;
  * assembly into per-image rows is slicing/reshaping that XLA fuses
    into the pixel stage's transposes — no standalone pass.

The program is keyed on (tables, max_blk, layout, pad_to, geometry),
i.e. one compile per (geometry x restart-layout) bucket — coarser reuse
than the layout-independent fsm._decode_jit, but the batch engine
buckets chunks by geometry anyway.  Single-group plans only; the
grouped-stride path keeps the staged chain (fsm.decode_plan).

Per-chunk device cost measured on the v5e (64x640^2 q90 rst=1 chunks):
staged chain ~58 ms marginal -> fused ~40 ms (tools/profile_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import fsm
from ..pipeline import Geometry, device_decode_fn


def _assemble_rows(per_lane: jnp.ndarray, layout, pad_to: int) -> jnp.ndarray:
    """[L, max_blk, ...] lane rows -> [pad_to, n_blocks_img, ...].

    Same slicing as fsm.assemble_batched, but traced inline so XLA fuses
    it into the consumer instead of materializing an intermediate.
    """
    tail = per_lane.shape[2:]
    per_img = []
    for first, n_lanes, rib, last in layout:
        rows = [
            per_lane[first : first + n_lanes - 1, :rib].reshape((-1,) + tail)
        ]
        rows.append(per_lane[first + n_lanes - 1, :last])
        per_img.append(jnp.concatenate(rows) if n_lanes > 1 else rows[-1])
    out = jnp.stack(per_img)
    if pad_to > out.shape[0]:
        pad = jnp.zeros((pad_to - out.shape[0],) + out.shape[1:], out.dtype)
        out = jnp.concatenate([out, pad])
    return out


@functools.lru_cache(maxsize=64)
def compiled_fused_decoder(
    geom: Geometry,
    tables: fsm.FsmTables,
    max_blk: int,
    layout: tuple,
    pad_to: int,
    fancy: bool = False,
    steps=fsm.STEPS_PRODUCTION,
    want_coeffs: bool = True,
):
    """One jitted program: scan bytes [L, stride] -> rgb + risk + errors.

    Returns fn(xs, seg_n_blocks, quant) ->
      (rgb uint8 [B, 3, H, W], riskbits, coeffs int16 [B, nb, 64] with
       RAW DC diffs, dc int32 [B, nb] resolved, err_mal [L], err_env [L],
       scan_state).

    coeffs+dc exist for the strict-repair path (risk pixels re-derive
    from exact coefficients); want_coeffs=False replaces them with None
    and saves their HBM writes (jit outputs cannot be dead-code
    eliminated).  scan_state is surfaced because XLA:CPU miscompiles
    scans with dead carry outputs (fsm._fsm_scan NB).
    """

    def run(xs, seg_n_blocks, quant):
        events, (err_mal, err_env), scan_state = fsm._fsm_scan(
            xs.T, seg_n_blocks, tables, steps=steps
        )
        stride, S, L = events.shape
        ev = events.reshape(stride * S, L)
        M = max_blk * 64
        coeffs_t = fsm._materialize_events(ev, M)     # int16 on the TPU path
        per_lane = coeffs_t.T.reshape(L, max_blk, 64)
        dc_lane = fsm._dc_cumsum(
            per_lane[:, :, 0].astype(jnp.int32), tables, max_blk
        )
        coeffs = _assemble_rows(per_lane, layout, pad_to)   # [B, nb, 64]
        dc = _assemble_rows(dc_lane, layout, pad_to)        # [B, nb] int32
        rgb, risk = jax.vmap(
            lambda c, d, q: device_decode_fn(geom, c, q, fancy=fancy, dc=d)
        )(coeffs, dc, quant)
        if not want_coeffs:
            coeffs = dc = None
        return rgb, risk, coeffs, dc, err_mal, err_env, scan_state

    return jax.jit(run)


def decode_chunk_fused(plan: fsm.FsmPlan, quant, geom: Geometry, pad_to: int,
                       fancy: bool = False, steps=fsm.STEPS_PRODUCTION,
                       uploaded=None, want_coeffs: bool = True):
    """Convenience wrapper: run a single-group plan through the fused
    program.  `uploaded` is (xs_dev, seg_n_dev) to skip the host upload
    (the kernel-only benchmark methodology)."""
    assert len(plan.groups) == 1, "fused path requires a single-group plan"
    if uploaded is None:
        xs, sn = plan.groups[0]
        uploaded = (jax.device_put(jnp.asarray(xs)),
                    jax.device_put(jnp.asarray(sn)))
    fn = compiled_fused_decoder(
        geom, plan.tables, plan.max_blk, plan.layout, pad_to, fancy, steps,
        want_coeffs,
    )
    return fn(uploaded[0], uploaded[1], quant)
