"""Derive the risk threshold for the device G channel and prove coverage.

For every (Y, Cb, Cr) in [-256,255]^3 (the full reachable domain), compute
  g32  : the device f32 formula (divide variant)
  g64  : the oracle mixed-precision value
and record (a) the max |g32 - g64|, (b) for every triple where the final
truncated integer differs, the distance of g32+128 to the nearest integer,
and (c) the fraction of the domain flagged at candidate thresholds.

A triple is repaired on host iff dist(g32+128, nearest int) < EPS.  Safe iff
every mismatching triple is flagged.
"""

import numpy as np

from tpujpeg.constants import C_BLUE, C_GY_B, C_GY_DIV, C_GY_R, C_RED


def main():
    vals = np.arange(-256, 256, dtype=np.int32)
    cb3, cr3 = np.meshgrid(vals, vals, indexing="ij")
    cbf = cb3.astype(np.float32)
    crf = cr3.astype(np.float32)

    max_abs_err = 0.0
    mismatch_dists = []
    flagged = {1e-4: 0, 3e-4: 0, 1e-3: 0}
    total = 512**3

    for yv in vals:
        yf32 = np.float32(yv)
        yf64 = np.float64(yv)
        r32 = np.float32(C_RED) * crf + yf32
        b32 = np.float32(C_BLUE) * cbf + yf32
        g32 = (yf32 - np.float32(C_GY_B) * b32 - np.float32(C_GY_R) * r32) / np.float32(
            C_GY_DIV
        )
        # oracle
        r64 = (C_RED * cr3 + yf64).astype(np.float32)
        b64 = (C_BLUE * cb3 + yf64).astype(np.float32)
        g64 = (
            (yf64 - C_GY_B * b64.astype(np.float64) - C_GY_R * r64.astype(np.float64))
            / C_GY_DIV
        ).astype(np.float32)

        err = np.abs(g32.astype(np.float64) - g64.astype(np.float64))
        max_abs_err = max(max_abs_err, float(err.max()))

        gi32 = np.clip(np.trunc(g32 + np.float32(128.0)).astype(np.int32), 0, 255)
        gi64 = np.clip(np.trunc(g64 + np.float32(128.0)).astype(np.int32), 0, 255)
        shifted = g32 + np.float32(128.0)
        dist = np.abs(shifted - np.round(shifted))
        mm = gi32 != gi64
        if mm.any():
            mismatch_dists.extend(dist[mm].tolist())
        for eps in flagged:
            flagged[eps] += int((dist < eps).sum())

    print(f"max |g32-g64| over domain: {max_abs_err:.3e}")
    if mismatch_dists:
        print(
            f"mismatches: {len(mismatch_dists)}, max dist to boundary "
            f"{max(mismatch_dists):.3e}"
        )
    for eps, count in flagged.items():
        covered = all(d < eps for d in mismatch_dists)
        print(
            f"eps={eps:g}: flags {count}/{total} = {count/total:.2e} of domain, "
            f"covers all mismatches: {covered}"
        )


if __name__ == "__main__":
    main()
