"""Fused Pallas pixel kernel: dequant + DC substitute + IDCT + color in
one VMEM-resident pass (4:4:4 / three-component, full-resolution only).

Why: the XLA pixel program (pipeline._decode_rgb_planar_fused) measures
~15.8 ms real per 64x640^2 chunk (benchmark_results/profile_r3.txt,
marginal x4-x1/3 method) against a ~1-2 ms HBM floor — XLA materializes
the int32 coefficient planes between the dequant/IDCT/color stages, so
the chain round-trips ~300 MB of HBM several times.  This kernel runs
the whole block-domain computation on [64, T] MCU tiles inside VMEM:
int16 coefficients in, packed int16 pixels out, one HBM round-trip.
It is the TPU answer to the reference's fused decodeKernel
(cuda-decoder/src/parser.cu:535-575: dequant+zigzag+IDCT+color in one
CUDA kernel); entropy decode stays in the FSM scan program.

Design constraints (probed on the real v5e, PERFORMANCE.md):
  * int16 vectors only lower add/and/or/xor/not + converts -> all
    arithmetic runs int32/f32 in-kernel; HBM storage stays int16;
  * no in-kernel gathers -> the zigzag reorder + SoA transpose happen in
    the XLA prologue (a static row permute fused into the transpose the
    old path already paid for);
  * uint8 stores unproven -> the kernel packs two 8-bit results per
    int16 lane: out_rg = r | g<<8, out_bk = b | risky<<8.  Same output
    bytes/pixel as 3x uint8 + 1x bool (4), and the XLA epilogue unpacks
    with shifts fused into the raster transpose.

Bit-exactness: the butterflies are ops/idct.py's `_rowpass`/`_colpass`
and the color math is ops/color.py's `color_core` — the SAME traced
definitions the XLA path uses, so the kernel cannot drift from the
proven arithmetic; tests/test_pixels_pallas.py diffs interpret-mode
output bit-for-bit against the XLA path and the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .color import color_core
from .idct import _colpass, _rowpass

# Lane tile (MCU axis).  [64, 512] int32 planes are 128 KB; the kernel
# keeps ~10 live per component, comfortably under the ~16 MB VMEM budget.
TILE = 512


# Row order the kernel expects its coefficient planes in: k-major, i.e.
# input row 8k+rr holds natural coefficient 8rr+k.  This lets the row
# pass consume contiguous [8, T] slabs (operand k = rows 8k..8k+7, one
# sublane per block-row rr) so every butterfly runs at FULL sublane
# width — the first kernel version sliced [1, T] operands and measured
# ~18 ms/chunk because each vector op used 1/8 of the VPU's sublanes.
# The prologue folds this permutation into the zigzag take for free.
KMAJOR_OF_NATURAL = [8 * (j % 8) + j // 8 for j in range(64)]


def _idct64(x: jnp.ndarray) -> jnp.ndarray:
    """[64, T] int32 k-major coefficient rows -> [64, T] natural pixel
    rows (row p = raster position (p//8, p%8) of every block).

    Same butterfly definitions as idct.idct_planes, vectorized across
    the 8 block-rows: the row pass maps over [8, T] slabs, an 8x8
    sublane transpose (64 slice+concat copies, cheap) reorients the
    intermediate, and the column pass maps over [8, T] again.
    """
    c = [x[8 * k : 8 * k + 8] for k in range(8)]       # [8(rr), T] each
    r = _rowpass(c[0], c[4], c[6], c[2], c[1], c[7], c[5], c[3])
    # transpose (rr, cc): z[rr] stacks r[cc]'s sublane rr over cc
    z = [
        jnp.concatenate([r[cc][rr : rr + 1] for cc in range(8)], axis=0)
        for rr in range(8)
    ]                                                   # [8(cc), T] each
    o = _colpass(z[0], z[4], z[6], z[2], z[1], z[7], z[5], z[3])
    return jnp.concatenate(o, axis=0)                   # row 8*rr + cc


def _sext16(v: jnp.ndarray) -> jnp.ndarray:
    """Reinterpret the low 16 bits of int32 as int16 (values may exceed
    32767 after packing; plain astype would be UB-ish on overflow)."""
    return ((v << 16) >> 16).astype(jnp.int16)


def _pixel_kernel(y_ref, cb_ref, cr_ref, qy_ref, qcb_ref, qcr_ref,
                  dy_ref, dcb_ref, dcr_ref, rg_ref, bk_ref):
    pix = []
    for c_ref, q_ref, d_ref in (
        (y_ref, qy_ref, dy_ref),
        (cb_ref, qcb_ref, dcb_ref),
        (cr_ref, qcr_ref, dcr_ref),
    ):
        x = c_ref[:].astype(jnp.int32)          # [64, T]
        q = q_ref[:]                            # [64, 1] int32
        deq = x * q
        d0 = d_ref[:] * q[0:1]                  # [1, T] resolved DC * q0
        pix.append(_idct64(jnp.concatenate([d0, deq[1:]], axis=0)))
    (r, g, b), risky = color_core(*pix)
    rg_ref[:] = _sext16(r | (g << 8))
    bk_ref[:] = _sext16(b | (risky.astype(jnp.int32) << 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def rgb_soa_fused(zp: jnp.ndarray, quant_nat: jnp.ndarray,
                  dc_planes: jnp.ndarray, *, interpret: bool = False):
    """One image: natural-order SoA coefficient planes -> packed pixels.

    zp:        int16 [3, 64, P] natural-order coefficient planes
               (row p of comp c = natural position p of its MCU blocks;
               P = n_mcus padded to a TILE multiple).
    quant_nat: int32 [3, 64, 1] natural-order quant columns.
    dc_planes: int32 [3, 1, P] resolved DC coefficients.

    Returns (rg, bk) int16 [64, P]: rg packs r | g<<8, bk packs
    b | risky<<8 (low bytes unsigned).  vmap over a leading batch axis
    adds a grid dimension (the fused chunk program does exactly that).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = zp.shape[-1]
    assert P % TILE == 0, "caller pads the MCU axis to a TILE multiple"
    plane = pl.BlockSpec((64, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((64, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM)
    rg, bk = pl.pallas_call(
        _pixel_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((64, P), jnp.int16),
            jax.ShapeDtypeStruct((64, P), jnp.int16),
        ),
        grid=(P // TILE,),
        in_specs=[plane] * 3 + [qspec] * 3 + [dspec] * 3,
        out_specs=(plane, plane),
        interpret=interpret,
    )(zp[0], zp[1], zp[2], quant_nat[0], quant_nat[1], quant_nat[2],
      dc_planes[0], dc_planes[1], dc_planes[2])
    return rg, bk


def unpack_pixels(rg: jnp.ndarray, bk: jnp.ndarray):
    """Packed int16 pixel planes -> ([r, g, b] uint8, risky bool).

    Pure shifts/masks — XLA fuses this into the consumer's raster
    transpose, so the unpack costs no extra HBM pass.
    """
    rgi = rg.astype(jnp.int32) & 0xFFFF
    bki = bk.astype(jnp.int32) & 0xFFFF
    r = (rgi & 0xFF).astype(jnp.uint8)
    g = (rgi >> 8).astype(jnp.uint8)
    b = (bki & 0xFF).astype(jnp.uint8)
    risky = ((bki >> 8) & 1).astype(bool)
    return [r, g, b], risky
