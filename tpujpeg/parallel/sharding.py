"""Multi-chip decode: batch sharding and MCU-stripe sharding over a Mesh.

The reference is single-GPU/single-process (SURVEY §2.7); its batch layer is
`batchDecodeKernel<<<B,256>>>` mapping blockIdx.x -> image
(cuda-decoder/src/parser.cu:663-682).  The TPU-native equivalents:

- **Batch (data) parallelism**: a size-bucketed batch of coefficient arrays
  is sharded over the `batch` mesh axis with shard_map; each chip runs the
  same single-image decode program vmapped over its local shard.  The only
  collective is a psum of decode metrics.

- **MCU-stripe (sequence) parallelism**: one huge image's MCU rows are
  sharded over the `stripe` axis.  Dequant/IDCT/color are per-block or
  per-pixel, and for box upsampling each output row depends only on its own
  MCU row, so stripes compute locally and the full image is materialized
  with an all_gather along `stripe` (ICI).  This is the decode analog of
  sequence parallelism; halo exchange slots in here when fancy
  (triangle-filter) upsampling is added.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import Geometry, device_decode_fn


def make_mesh(n_batch: int | None = None, n_stripe: int = 1, devices=None) -> Mesh:
    """Build a (batch, stripe) mesh over the available devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    if n_batch is None:
        n_batch = devices.size // n_stripe
    return Mesh(devices.reshape(n_batch, n_stripe), ("batch", "stripe"))


# ---------------------------------------------------------------------------
# Batch-parallel decode
# ---------------------------------------------------------------------------


def batched_decode_fn(geom: Geometry, coeffs: jnp.ndarray, quant: jnp.ndarray):
    """vmapped single-image decode: [B, n_blocks, 64] -> ([B,H,W,3], [B,...])."""
    return jax.vmap(functools.partial(device_decode_fn, geom))(coeffs, quant)


@functools.lru_cache(maxsize=64)
def compiled_batch_decoder(geom: Geometry, mesh: Mesh):
    """jit a batch decode sharded over the `batch` mesh axis.

    Inputs must have a leading batch dim divisible by the batch axis size.
    Returns (rgb, riskbits, metrics) with metrics = global decoded-pixel
    count (psum over the mesh — the cross-chip reduction the reference's
    benchmark layer does on host).
    """

    def step(coeffs, quant):
        def local(coeffs_l, quant_l):
            rgb, risk = batched_decode_fn(geom, coeffs_l, quant_l)
            pixels = jnp.asarray(
                rgb.shape[0] * geom.width * geom.height, dtype=jnp.int32
            )
            total = jax.lax.psum(pixels, axis_name="batch")
            return rgb, risk, total

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("batch"), P("batch")),
            out_specs=(P("batch"), P("batch"), P()),
        )(coeffs, quant)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Stripe-parallel decode of one huge image
# ---------------------------------------------------------------------------


def stripe_geometry(geom: Geometry, n_stripes: int) -> Geometry:
    """Geometry of one horizontal stripe of `geom` (mcus_y split evenly)."""
    if geom.mcus_y % n_stripes:
        raise ValueError(f"mcus_y={geom.mcus_y} not divisible by {n_stripes}")
    rows = geom.mcus_y // n_stripes
    return Geometry(
        (geom.width, rows * 8 * geom.max_v, geom.mcus_x, rows, geom.comps)
    )


@functools.lru_cache(maxsize=64)
def compiled_stripe_decoder(geom: Geometry, mesh: Mesh):
    """jit a single-image decode with MCU rows sharded over `stripe`.

    coeffs [n_blocks, 64] is sharded by block (MCU-row-major order means an
    even block split == an even MCU-row split); each chip decodes its stripe
    of rows locally, then the stripes are all_gathered into the full frame.
    The stripe height is a multiple of the MCU height so no cross-stripe
    dependency exists for box upsampling.
    """
    n_stripes = mesh.shape["stripe"]
    sub = stripe_geometry(geom, n_stripes)

    def step(coeffs, quant):
        def local(coeffs_l, quant_l):
            rgb, risk = device_decode_fn(sub, coeffs_l, quant_l)
            rgb_full = jax.lax.all_gather(rgb, "stripe", axis=0, tiled=True)
            risk_full = jax.lax.all_gather(risk, "stripe", axis=0, tiled=True)
            return rgb_full, risk_full

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("stripe"), P()),
            out_specs=(P(), P()),
            # all_gather(tiled) leaves outputs replicated over `stripe`;
            # disable the varying-axes check that can't see that.
            check_vma=False,
        )(coeffs, quant)

    return jax.jit(step)


def decode_striped(
    img, n_stripes: int | None = None, mesh: Mesh | None = None, strict: bool = True
):
    """Decode one image with its MCU rows sharded across chips.

    Host entropy decode -> stripe-sharded device pipeline -> [H, W, 3],
    bit-exact (strict repairs flagged color-boundary pixels, as in
    pipeline.decode).
    """
    from ..ops.color import unpack_mask
    from ..pipeline import _repair, build_plan

    geom, coeffs, quant = build_plan(img)
    if mesh is None:
        mesh = make_mesh(n_batch=1, n_stripe=n_stripes or len(jax.devices()))
    fn = compiled_stripe_decoder(geom, mesh)
    rgb, risk = fn(jnp.asarray(coeffs), jnp.asarray(quant))
    rgb = np.asarray(jax.device_get(rgb)).astype(np.int32)[: img.height]
    if strict:
        mask = unpack_mask(np.asarray(jax.device_get(risk)), img.width)[: img.height]
        if mask.any():
            _repair(img, coeffs, rgb, mask)
    return rgb
