"""Prove the multi-chip decode claims from the compiled HLO.

PARITY.md / PERFORMANCE.md claim the batch path shards lanes across the
mesh with ZERO data collectives (the only cross-chip op is the psum of
the pixel-count metric), and that huge-image stripe decode pays exactly
one halo exchange per chroma plane plus the output all_gathers.  This
tool compiles both sharded programs on a virtual mesh and counts the
collective ops in the optimized HLO — the claim becomes a checkable
artifact instead of prose (BASELINE.md's scaling targets rest on it:
collective-free lane decode scales linearly in lanes by construction).

Run on the forced-CPU 8-device mesh (no TPU needed; sharding decisions
and collective insertion are backend-independent at this level):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/check_collectives.py
"""

from __future__ import annotations

import collections
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\b"
)


def count_collectives(compiled) -> collections.Counter:
    hlo = compiled.as_text()
    return collections.Counter(_COLLECTIVE_RE.findall(hlo))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm
    from tpujpeg.parallel import sharding
    from tpujpeg.pipeline import Geometry

    ndev = len(jax.devices())
    print(f"devices={ndev}")

    # -- batch path: lane-sharded FSM + batch-sharded pixel program ----------
    from bench import _encode, _make_image

    imgs = [parse(_encode(_make_image(64, i), 90, 1)) for i in range(8)]
    plan = fsm.build_plan(imgs, split=False)
    xs, sn = plan.groups[0]

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sharding.make_mesh(n_batch=ndev, n_stripe=1)
    lane_sharding = NamedSharding(mesh, P("batch", None))
    xs_d = jax.device_put(jnp.asarray(xs), lane_sharding)
    sn_d = jax.device_put(
        jnp.asarray(sn), NamedSharding(mesh, P("batch"))
    )
    dec = jax.jit(
        lambda a, b: fsm._decode_jit(
            a, b, tables=plan.tables, max_blk=plan.max_blk
        )
    )
    comp = dec.lower(xs_d, sn_d).compile()
    c1 = count_collectives(comp)
    print(f"lane-sharded FSM decode collectives: {dict(c1) or 'NONE'}")

    geom = Geometry.of(imgs[0])
    fn = sharding.compiled_batch_decoder(geom, mesh)
    B = ndev
    coeffs = jnp.zeros((B, geom.n_blocks, 64), jnp.int32)
    quant = jnp.zeros((B, len(geom.comps), 64), jnp.int32)
    comp2 = fn.lower(coeffs, quant).compile()
    c2 = count_collectives(comp2)
    print(f"batch pixel program collectives:     {dict(c2) or 'NONE'}")

    # -- stripe path: halo exchange + output gather --------------------------
    mesh_s = sharding.make_mesh(n_batch=1, n_stripe=ndev)
    full = Geometry((256, 8 * 2 * ndev, 256 // 8, 2 * ndev, geom.comps))
    fn_s = sharding.compiled_stripe_decoder(full, mesh_s, fancy=True)
    coeffs_s = jnp.zeros((full.n_blocks, 64), jnp.int32)
    quant_s = jnp.zeros((len(full.comps), 64), jnp.int32)
    comp3 = fn_s.lower(coeffs_s, quant_s).compile()
    c3 = count_collectives(comp3)
    print(f"stripe decode (fancy halo) collectives: {dict(c3)}")

    ok = (
        not c1                       # entropy decode: zero collectives
        and set(c2) <= {"all-reduce"}  # metrics psum only
        and c2.get("all-reduce", 0) <= 1
        # stripes: the two output all_gathers (rgb, risk) plus at most
        # the chroma-halo exchanges (XLA may fold them into the gathers)
        and set(c3) <= {"all-gather", "collective-permute"}
        and c3.get("all-gather", 0) == 2
        and c3.get("collective-permute", 0) <= 2
    )
    print("CLAIM HOLDS" if ok else "CLAIM VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
