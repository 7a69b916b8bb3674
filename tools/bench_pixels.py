"""Pixel-program cost split on the real chip.

The fused chunk's pixel stage (dequant + inverse zigzag + integer IDCT +
color + raster transpose, pipeline._decode_rgb_planar_fused vmapped over
the batch) measures ~14 ms real per 64x640^2 chunk — ~6x the pure HBM
bound for its traffic.  This probe times each sub-stage as its own jitted
program at the bench shape to find which hand-off XLA fails to fuse.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(x):
    import jax

    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1]))


def timed(label, fn, *args, iters=3):
    fn(*args)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<52s} {best * 1e3:9.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpujpeg import pipeline
    from tpujpeg.ops import idct as idct_mod
    from tpujpeg.ops.color import color_channels, pack_mask
    from tpujpeg.pipeline import Geometry
    from bench import _encode, _make_image
    from tpujpeg.io.parser import parse

    img = parse(_encode(_make_image(args.size, 0), 90, 1))
    geom = Geometry.of(img)
    B = args.images
    nb = geom.n_blocks
    rng = np.random.default_rng(0)
    coeffs = rng.integers(-512, 512, (B, nb, 64), np.int16)
    quant = np.stack(
        [np.stack([img.quant_tables[c.quant_id] for c in img.components])] * B
    ).astype(np.int32)
    cd = jnp.asarray(coeffs)
    qd = jnp.asarray(quant)
    n = geom.n_mcus
    total_mb = coeffs.nbytes / 1e6
    print(f"B={B} n_blocks={nb} coeffs={total_mb:.0f} MB int16")

    # full pixel program (the fused chunk's pixel stage)
    full = jax.jit(
        jax.vmap(lambda c, q: pipeline.device_decode_fn(geom, c, q))
    )
    timed("full pixel program (vmapped)", full, cd, qd, iters=args.iters)

    # dequant + zigzag only -> [B, 64, n_comp*n_mcus] int32 planes
    deq_j = jax.jit(
        jax.vmap(lambda c, q: pipeline._idct_planar.__wrapped__(geom, c, q)
                 if hasattr(pipeline._idct_planar, "__wrapped__")
                 else pipeline._idct_planar(geom, c, q))
    )
    timed("dequant+zigzag+IDCT (planar)", deq_j, cd, qd, iters=args.iters)

    # IDCT alone on ready planes
    planes = jnp.asarray(
        rng.integers(-2048, 2048, (B, 64, 3 * n), np.int32)
    )
    idct_j = jax.jit(jax.vmap(idct_mod.idct_planes))
    timed("idct_planes alone (int32 in)", idct_j, planes, iters=args.iters)

    # color + raster transpose alone on ready pixel planes
    pix = jnp.asarray(rng.integers(-256, 256, (B, 64, 3 * n), np.int32))

    def color_and_raster(pixb):
        y, cb, cr = pixb[:, :n], pixb[:, n : 2 * n], pixb[:, 2 * n :]
        chans, risky = color_channels(y, cb, cr)
        rgb = jnp.stack(chans)
        rgb = (
            rgb.reshape(3, 8, 8, geom.mcus_y, geom.mcus_x)
            .transpose(0, 3, 1, 4, 2)
            .reshape(3, geom.mcus_y * 8, geom.mcus_x * 8)
        )
        risky = (
            risky.reshape(8, 8, geom.mcus_y, geom.mcus_x)
            .transpose(2, 0, 3, 1)
            .reshape(geom.mcus_y * 8, geom.mcus_x * 8)
        )
        rgb = rgb[:, : geom.height, : geom.width]
        return rgb, pack_mask(risky[: geom.height, : geom.width])

    cr_j = jax.jit(jax.vmap(color_and_raster))
    timed("color+raster transpose alone", cr_j, pix, iters=args.iters)

    # color WITHOUT the raster transpose (block-domain output)
    def color_only(pixb):
        y, cb, cr = pixb[:, :n], pixb[:, n : 2 * n], pixb[:, 2 * n :]
        chans, risky = color_channels(y, cb, cr)
        return jnp.stack(chans), risky.sum()

    timed("color only (block domain)", jax.jit(jax.vmap(color_only)), pix,
          iters=args.iters)

    # raster transpose alone (uint8 in, uint8 out)
    rgb_blocks = jnp.asarray(
        rng.integers(0, 256, (B, 3, 64, n), np.uint8)
    )

    def raster_only(rgbb):
        return (
            rgbb.reshape(3, 8, 8, geom.mcus_y, geom.mcus_x)
            .transpose(0, 3, 1, 4, 2)
            .reshape(3, geom.mcus_y * 8, geom.mcus_x * 8)
        )

    timed("raster transpose alone (uint8)",
          jax.jit(jax.vmap(raster_only)), rgb_blocks, iters=args.iters)

    # the int16->int32 cast + dequant multiply alone
    def deq_only(c, q):
        per_mcu = c.astype(jnp.int32).reshape(geom.n_mcus, 3, 64)
        outs = []
        for ci in range(3):
            zp = per_mcu[:, ci, :].reshape(-1, 64).T
            outs.append(zp * q[ci][:, None])
        return jnp.concatenate(outs, axis=1)

    timed("cast+dequant only", jax.jit(jax.vmap(deq_only)), cd, qd,
          iters=args.iters)


if __name__ == "__main__":
    main()
