"""Single-image decode pipeline: host entropy decode -> device kernels.

This is the TPU rendition of the reference's fused `decodeKernel`
(cuda-decoder/src/parser.cu:577-661): the four device stages (dequant +
inverse zigzag, IDCT rows, IDCT cols, color conversion) become one jitted
XLA program over dense coefficient arrays.  Entropy decoding happens on the
host (the cudaH strategy — the reference's fastest per-image variant,
legacy_versions/cudaH-implementation, BASELINE.md) until the device-side
segment-parallel decoder takes over for restart-interval streams.

Shapes are static per image geometry; the jit cache is keyed on a frozen
`Geometry` so repeated decodes of one size class compile once (SURVEY §8
hard-part #3: ragged shapes under jit are handled by size-class bucketing).

Bit-exactness: device math is exact for everything except a ~0.2% sliver of
color-conversion boundary cases, which the device flags into a 1-bit/pixel
mask and the host repairs with oracle math (see ops/color.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import NATURAL_TO_ZIGZAG, ZIGZAG_TO_NATURAL
from .io.parser import JpegImage
from .ops.color import pack_mask, unpack_mask, ycbcr_to_rgb
from .ops.idct import idct_blocks
from .oracle import decoder as oracle


# ---------------------------------------------------------------------------
# Static geometry (jit cache key)
# ---------------------------------------------------------------------------


class Geometry(tuple):
    """Hashable static decode geometry.

    Layout: (width, height, mcus_x, mcus_y, comps) with comps a tuple of
    (h, v, quant_slot) per component, quant_slot indexing the [n_comp, 64]
    quant array passed to the device.
    """

    __slots__ = ()

    @staticmethod
    def of(img: JpegImage) -> "Geometry":
        comps = tuple((c.h, c.v, i) for i, c in enumerate(img.components))
        return Geometry(
            (img.width, img.height, img.mcus_x, img.mcus_y, comps)
        )

    width = property(lambda s: s[0])
    height = property(lambda s: s[1])
    mcus_x = property(lambda s: s[2])
    mcus_y = property(lambda s: s[3])
    comps = property(lambda s: s[4])

    @property
    def max_h(self) -> int:
        return max(c[0] for c in self.comps)

    @property
    def max_v(self) -> int:
        return max(c[1] for c in self.comps)

    @property
    def blocks_per_mcu(self) -> int:
        return sum(h * v for h, v, _ in self.comps)

    @property
    def n_mcus(self) -> int:
        return self.mcus_x * self.mcus_y

    @property
    def n_blocks(self) -> int:
        return self.n_mcus * self.blocks_per_mcu

    def pattern(self) -> np.ndarray:
        out = []
        for ci, (h, v, _) in enumerate(self.comps):
            out.extend([ci] * (h * v))
        return np.array(out, dtype=np.int32)


# ---------------------------------------------------------------------------
# Device program
# ---------------------------------------------------------------------------


def _assemble_planes(geom: Geometry, pixels: jnp.ndarray) -> list[jnp.ndarray]:
    """Scan-order [n_blocks, 8, 8] -> full-size per-component planes.

    Static reshapes/transposes only; chroma upsampling is sample replication
    (box), matching the oracle.
    """
    blocks = pixels.reshape(geom.n_mcus, geom.blocks_per_mcu, 8, 8)
    planes = []
    base = 0
    for h, v, _ in geom.comps:
        nb = h * v
        grid = blocks[:, base : base + nb].reshape(
            geom.mcus_y, geom.mcus_x, v, h, 8, 8
        )
        base += nb
        plane = grid.transpose(0, 2, 4, 1, 3, 5).reshape(
            geom.mcus_y * v * 8, geom.mcus_x * h * 8
        )
        if h != geom.max_h:
            plane = jnp.repeat(plane, geom.max_h // h, axis=1)
        if v != geom.max_v:
            plane = jnp.repeat(plane, geom.max_v // v, axis=0)
        planes.append(plane)
    return planes


def device_decode_fn(
    geom: Geometry, coeffs: jnp.ndarray, quant: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The jittable decode body: coefficients -> (rgb uint8, packed riskbits).

    coeffs: int32 or int16 [n_blocks, 64], zigzag order, scan order, DPCM
        resolved (int16 is lossless for conformant baseline scans and
        halves the host->device transfer; math still runs in int32).
    quant:  int32 [n_comp, 64], zigzag order.
    """
    coeffs = coeffs.astype(jnp.int32)
    pattern = jnp.asarray(np.tile(geom.pattern(), geom.n_mcus))
    block_quant = jnp.take(quant, pattern, axis=0)  # [n_blocks, 64]
    deq = coeffs * block_quant  # zigzag domain (cpp parser.cpp:111,130)
    natural = jnp.take(deq, jnp.asarray(ZIGZAG_TO_NATURAL), axis=1)
    pixels = idct_blocks(natural.reshape(geom.n_blocks, 8, 8))
    planes = _assemble_planes(geom, pixels)
    if len(planes) == 1:
        y = planes[0][: geom.height, : geom.width]
        zeros = jnp.zeros_like(y)
        rgb, risky = ycbcr_to_rgb(y, zeros, zeros)
    else:
        y, cb, cr = (p[: geom.height, : geom.width] for p in planes)
        rgb, risky = ycbcr_to_rgb(y, cb, cr)
    return rgb, pack_mask(risky)


@functools.lru_cache(maxsize=256)
def _compiled(geom: Geometry):
    return jax.jit(functools.partial(device_decode_fn, geom))


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


def build_plan(img: JpegImage) -> tuple[Geometry, np.ndarray, np.ndarray]:
    """Host side: entropy-decode the scan and pack device inputs."""
    from .runtime.host import entropy_decode

    coeffs = entropy_decode(img)
    quant = np.stack(
        [img.quant_tables[c.quant_id].astype(np.int32) for c in img.components]
    )
    return Geometry.of(img), coeffs, quant


def decode(img: JpegImage, strict: bool = True) -> np.ndarray:
    """Decode one image on the device. Returns int32 [H, W, 3] RGB.

    strict=True repairs flagged color-boundary pixels with oracle math,
    guaranteeing bit-exact equality with the reference decoder.
    """
    geom, coeffs, quant = build_plan(img)
    rgb_dev, riskbits = _compiled(geom)(jnp.asarray(coeffs), jnp.asarray(quant))
    rgb = np.asarray(jax.device_get(rgb_dev)).astype(np.int32)
    if strict:
        packed = np.asarray(jax.device_get(riskbits))
        mask = unpack_mask(packed, img.width)
        if mask.any():
            _repair(img, coeffs, rgb, mask)
    return rgb


def _repair(
    img: JpegImage, coeffs: np.ndarray, rgb: np.ndarray, mask: np.ndarray
) -> None:
    """Recompute flagged pixels with exact oracle math, in place.

    Cost: a handful of vectorized 8x8 IDCTs on the unique touched blocks —
    O(flagged pixels), typically <0.1% of the image.
    """
    py, px = np.nonzero(mask)
    comps = img.components
    max_h, max_v = img.max_h, img.max_v
    comp_base = np.cumsum([0] + [c.h * c.v for c in comps])
    quant = {i: img.quant_tables[c.quant_id].astype(np.int64) for i, c in enumerate(comps)}

    samples = []
    for ci, c in enumerate(comps):
        cy = py * c.v // max_v
        cx = px * c.h // max_h
        by, bx = cy // 8, cx // 8
        mcu = (by // c.v) * img.mcus_x + (bx // c.h)
        block_idx = (
            mcu * img.blocks_per_mcu + comp_base[ci] + (by % c.v) * c.h + (bx % c.h)
        )
        uniq, inv = np.unique(block_idx, return_inverse=True)
        zz = coeffs[uniq].astype(np.int64) * quant[ci][None, :]
        natural = zz[:, ZIGZAG_TO_NATURAL].reshape(-1, 8, 8).astype(np.int32)
        pix = oracle.idct_blocks(natural)
        samples.append(pix[inv, cy % 8, cx % 8])
    if len(comps) == 1:
        y = samples[0]
        cb = cr = np.zeros_like(y)
    else:
        y, cb, cr = samples
    exact = oracle.ycbcr_to_rgb_exact(y, cb, cr)
    rgb[py, px] = exact


def decode_file(path: str, strict: bool = True) -> np.ndarray:
    from .io.parser import parse_file

    return decode(parse_file(path), strict=strict)
