"""Validate stripe-sharded decode at huge-image scale (VERDICT r1 #6).

Encodes a synthetic image at the requested size (default 16384x16384, the
BASELINE huge-image config), decodes it through
`parallel.sharding.decode_striped` on an 8-device mesh (virtual CPU mesh
by default; the real chip with TPUJPEG_TEST_TPU=1), verifies bit-exact
equality against the NumPy oracle, and reports wall-clock + peak-RSS
memory accounting as one JSON line.

  python tools/validate_huge.py                     # 16384^2, box
  python tools/validate_huge.py --size 8192 --fancy # 4:2:0 + halo fancy
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--quality", type=int, default=40)
    ap.add_argument("--stripes", type=int, default=8)
    ap.add_argument("--fancy", action="store_true",
                    help="encode 4:2:0 and use fancy upsampling (halo path)")
    ap.add_argument("--out", default=None, help="append the JSON record here")
    args = ap.parse_args()

    if not os.environ.get("TPUJPEG_TEST_TPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(8, args.stripes))

    import io

    import numpy as np
    from PIL import Image

    from tpujpeg.io.parser import parse
    from tpujpeg.oracle import decoder as oracle
    from tpujpeg.parallel import sharding

    Image.MAX_IMAGE_PIXELS = None
    n = args.size
    t0 = time.time()
    # smooth gradient + texture: compresses small, still exercises every MCU
    yy = np.linspace(0, 255, n, dtype=np.float32)
    xx = np.linspace(0, 255, n, dtype=np.float32)
    base = (yy[:, None] * 0.5 + xx[None, :] * 0.5).astype(np.uint8)
    arr = np.stack([base, base[::-1], base.T[:, ::-1] if n else base], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, "JPEG", quality=args.quality,
        subsampling=2 if args.fancy else 0,
    )
    data = buf.getvalue()
    del arr, base
    t_encode = time.time() - t0

    img = parse(data)
    mcu_rows = img.mcus_y
    assert mcu_rows % args.stripes == 0, (mcu_rows, args.stripes)

    t0 = time.time()
    got = sharding.decode_striped(
        img, n_stripes=args.stripes, strict=True, fancy=args.fancy
    )
    t_striped = time.time() - t0

    t0 = time.time()
    want = oracle.decode(img, fancy=args.fancy)
    t_oracle = time.time() - t0

    exact = bool(np.array_equal(got, want))
    rec = {
        "tool": "validate_huge",
        "size": n,
        "sampling": img.sampling,
        "fancy": args.fancy,
        "stripes": args.stripes,
        "compressed_mb": round(len(data) / 1e6, 1),
        "bit_exact_vs_oracle": exact,
        "striped_decode_s": round(t_striped, 1),
        "oracle_decode_s": round(t_oracle, 1),
        "encode_s": round(t_encode, 1),
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
        ),
        "mesh": f"{args.stripes} stripes "
                + ("(real chip)" if os.environ.get("TPUJPEG_TEST_TPU")
                   else "(virtual CPU mesh)"),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0 if exact else 1


if __name__ == "__main__":
    raise SystemExit(main())
