"""Chip exactness: fused photo-corpus chunk, slots vs classic, bit-equal."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import importlib.util
spec = importlib.util.spec_from_file_location("bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"))
b = importlib.util.module_from_spec(spec); spec.loader.exec_module(b)
import numpy as np, jax, jax.numpy as jnp
from tpujpeg.io.parser import parse
from tpujpeg.ops import fsm
from tpujpeg.pipeline import Geometry
from tpujpeg.runtime import fused

datas = [b._encode(b._make_photo_image(640, i), 90, 1) for i in range(64)]
imgs = [parse(d) for d in datas]
plan = fsm.build_plan(imgs, split=False)
geom = Geometry.of(imgs[0])
xs, sn = plan.groups[0]
up = (jax.device_put(jnp.asarray(xs)), jax.device_put(jnp.asarray(sn)))
quant = jnp.asarray(np.stack(
    [np.stack([im.quant_tables[c.quant_id] for c in im.components])
     for im in imgs]).astype(np.int32))
out = {}
for slots in (False, 256):
    rgb, risk, coeffs, dc, mal, env, slot, _ = fused.decode_chunk_fused(
        plan, quant, geom, 64, uploaded=up, slots=slots)
    assert not bool(jax.device_get((mal | env | slot).any())), slots
    out[slots] = (np.asarray(jax.device_get(rgb)),
                  np.asarray(jax.device_get(coeffs)),
                  np.asarray(jax.device_get(risk)))
np.testing.assert_array_equal(out[False][0], out[256][0])
np.testing.assert_array_equal(out[False][1], out[256][1])
# one image against the oracle: exact everywhere EXCEPT risk-marked
# pixels, which the engine repairs from exact coefficients downstream
# (pipeline._repair; the raw fused rgb is pre-repair by design)
from tpujpeg.oracle import decoder as oracle
from tpujpeg.ops.color import unpack_mask
ref = oracle.decode(imgs[0]).astype(np.uint8)
got = out[256][0][0].transpose(1, 2, 0)
mask = unpack_mask(out[256][2][0], geom.width)
mism = (got != ref).any(-1)
assert not (mism & ~mask).any(), "non-risk pixel mismatch"
diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
assert diff.max() <= 1, "risk pixels beyond +-1"
print(f"PHOTO-SHAPE EXACTNESS OK (slots==classic; oracle exact outside "
      f"{int(mism.sum())} risk pixels, all +-1)")
