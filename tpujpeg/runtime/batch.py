"""Batched decode engine: the TPU analog of `batchDecodeKernel`.

The reference's batch layer packs per-image pointers into structs and
launches `batchDecodeKernel<<<B,256>>>` with host extract done serially
beforehand (cuda-decoder/src/parser.cu:663-682,
benchmark_thoughput/benchmark.cu:56-66).  This engine replaces that with a
pipelined three-stage design:

  1. **parse** — marker walk + de-stuff on a host thread pool;
  2. **entropy** — selectable backend:
       - 'host': the native C++ decoder on a thread pool (ctypes releases
         the GIL, OpenMP splits restart segments — the cudaH strategy);
       - 'fsm': the gather-free device FSM (ops/fsm.py) for
         restart-segmented streams;
       - 'oracle': the NumPy reference (debugging);
       - 'auto': fsm when every image in a chunk fits its envelope,
         host otherwise;
  3. **pixels** — the jitted device program (dequant + inverse zigzag +
     integer IDCT + color) vmapped over a geometry bucket, sharded over
     the mesh batch axis (parallel/sharding.py).

Chunks are dispatched to the device asynchronously, so stage 2 of chunk
n+1 overlaps stage 3 of chunk n — the host-level double buffering the
reference prototyped in its pipe1/pipe2 experiments
(legacy_versions/cudaO-implementation/src/parser_pipe2.cu, SURVEY §2.5).

Images are bucketed by `Geometry` (one XLA program per size class —
SURVEY §8 hard-part #3) and chunks are zero-padded to a fixed batch shape
so the jit cache stays small.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import JpegError
from ..io.parser import JpegImage, parse
from ..pipeline import Geometry, _repair
from ..ops.color import unpack_mask
from ..parallel import sharding


@dataclass
class BatchStats:
    """Wall-clock per stage for the last decode() call (seconds)."""

    n_images: int = 0
    compressed_bytes: int = 0
    pixels: int = 0
    parse_s: float = 0.0
    entropy_s: float = 0.0
    device_s: float = 0.0
    total_s: float = 0.0
    backend: str = ""
    chunks: int = 0
    repaired_pixels: int = 0
    failures: dict = field(default_factory=dict)  # index -> error message

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def _force_done(out) -> None:
    """Block until a chunk's device program has really finished.

    On the axon platform `block_until_ready` returns before the work is
    done; fetching a few real output elements is the only reliable fence
    (the transfer depends on the whole program).
    """
    rgb = out[0]
    np.asarray(jax.device_get(rgb[..., :1, :1, :1]))


@dataclass
class _Chunk:
    geom: Geometry
    indices: list[int]
    imgs: list[JpegImage]
    coeffs: np.ndarray | None = None   # [B, n_blocks, 64] int32 (host backend)
    coeffs_dev: object = None          # device coeffs (fsm backend)
    err: object = None                 # device err mask (fsm backend)
    out: object = None                 # device (rgb, risk, metrics)
    backend: str = ""


class BatchDecoder:
    """Reusable batched decoder; one instance owns its jit caches and pools."""

    def __init__(
        self,
        backend: str = "auto",
        workers: int | None = None,
        chunk_size: int = 32,
        mesh=None,
        strict: bool = True,
    ):
        if backend not in ("auto", "host", "fsm", "oracle"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.chunk_size = chunk_size
        self.strict = strict
        self.mesh = mesh if mesh is not None else sharding.make_mesh(n_stripe=1)
        self.pool = ThreadPoolExecutor(max_workers=workers)
        self.stats = BatchStats()

    # -- entropy backends ---------------------------------------------------

    def _entropy_host(self, imgs: list[JpegImage]) -> list[np.ndarray]:
        from . import host

        return list(self.pool.map(host.entropy_decode, imgs))

    def _entropy_host_list(self, imgs: list[JpegImage]) -> list[np.ndarray]:
        if self.backend == "oracle":
            from ..oracle import decoder as oracle

            return list(self.pool.map(oracle.entropy_decode, imgs))
        return self._entropy_host(imgs)

    # -- decode -------------------------------------------------------------

    def _make_chunks(self, imgs: list[JpegImage]) -> list[_Chunk]:
        buckets: dict[Geometry, list[int]] = {}
        for i, img in enumerate(imgs):
            buckets.setdefault(Geometry.of(img), []).append(i)
        chunks = []
        for geom, idxs in buckets.items():
            for j in range(0, len(idxs), self.chunk_size):
                part = idxs[j : j + self.chunk_size]
                chunks.append(
                    _Chunk(geom, part, [imgs[i] for i in part])
                )
        return chunks

    def _pad_batch(self) -> int:
        nb = self.mesh.shape["batch"]
        return -(-self.chunk_size // nb) * nb  # pad to the mesh batch axis

    def _quant_block(self, chunk: _Chunk, B: int) -> np.ndarray:
        quant = np.zeros((B, len(chunk.geom.comps), 64), np.int32)
        for bi, img in enumerate(chunk.imgs):
            quant[bi] = np.stack(
                [img.quant_tables[comp.quant_id] for comp in img.components]
            )
        return quant

    def _process_chunk_host(self, chunk: _Chunk):
        """Host entropy (threads + OpenMP) -> coefficient upload -> pixels.

        The native decoder writes int16 straight into the padded batch
        buffer: no per-image copy, and half the upload bytes (the dominant
        cost of this path at batch scale)."""
        from . import host

        geom = chunk.geom
        B = self._pad_batch()
        native = host._load_native()
        if native is not None and self.backend != "oracle":
            # np.empty: the native decoder writes every real row in full
            # (it zero-fills internally); only padding rows need clearing.
            coeffs = np.empty((B, geom.n_blocks, 64), np.int16)
            coeffs[len(chunk.imgs) :] = 0
            list(
                self.pool.map(
                    lambda t: native.entropy_decode(t[0], out=t[1]),
                    zip(chunk.imgs, coeffs),
                )
            )
        else:
            coeffs = np.zeros((B, geom.n_blocks, 64), np.int32)
            for bi, c in enumerate(self._entropy_host_list(chunk.imgs)):
                coeffs[bi] = c
        fn = sharding.compiled_batch_decoder(geom, self.mesh)
        chunk.out = fn(jnp.asarray(coeffs), jnp.asarray(self._quant_block(chunk, B)))
        chunk.coeffs = coeffs
        chunk.backend = "oracle" if self.backend == "oracle" else "host"

    def _process_chunk_fsm(self, chunk: _Chunk) -> bool:
        """Fully device-resident: scan bytes up, FSM decode, device-side
        assemble, pixel program.  Nothing but the scan crosses the host
        boundary.  Returns False when the chunk is outside the FSM envelope
        (no restart markers / exotic tables) so the caller can fall back."""
        from ..ops import fsm

        try:
            plan = fsm.build_plan(chunk.imgs)
        except JpegError:
            return False
        per_lane, err = fsm.decode_plan(plan)
        B = self._pad_batch()
        coeffs = fsm.assemble_batched(per_lane, layout=plan.layout, pad_to=B)
        coeffs = coeffs.reshape(B, chunk.geom.n_blocks, 64)
        fn = sharding.compiled_batch_decoder(chunk.geom, self.mesh)
        chunk.out = fn(coeffs, jnp.asarray(self._quant_block(chunk, B)))
        chunk.coeffs_dev = coeffs
        chunk.err = err
        chunk.backend = "fsm"
        return True

    def _process_chunk(self, chunk: _Chunk):
        if self.backend == "fsm":
            if not self._process_chunk_fsm(chunk):
                raise JpegError("fsm: chunk outside the FSM decode envelope")
            return
        if self.backend == "auto":
            from . import host

            # Prefer the native host decoder when present (it wins on
            # machines with a real host<->device link); the device FSM
            # covers hosts without a C++ toolchain.
            if host._load_native() is None and self._process_chunk_fsm(chunk):
                return
        self._process_chunk_host(chunk)

    def decode_parsed(
        self, imgs: list[JpegImage], fetch: bool = True
    ) -> list[np.ndarray] | None:
        """Decode parsed images. fetch=False leaves RGB on device (the
        reference's throughput benchmark also skips the output write,
        benchmark_thoughput/benchmark.cu:80-84)."""
        t_start = time.perf_counter()
        chunks = self._make_chunks(imgs)

        t_ent = 0.0
        for chunk in chunks:
            t0 = time.perf_counter()
            # async device dispatch: chunk n's device stages overlap chunk
            # n+1's host work
            self._process_chunk(chunk)
            t_ent += time.perf_counter() - t0

        t0 = time.perf_counter()
        for chunk in chunks:
            _force_done(chunk.out)
            if chunk.err is not None and bool(jax.device_get(jnp.any(chunk.err))):
                # malformed stream on the device path: redo on the host
                # decoder, which raises a precise JpegError for bad streams
                self._process_chunk_host(chunk)
                _force_done(chunk.out)
        t_dev = time.perf_counter() - t0

        self.stats = BatchStats(
            n_images=len(imgs),
            compressed_bytes=sum(im.scan_data.size for im in imgs),
            pixels=sum(im.width * im.height for im in imgs),
            entropy_s=t_ent,
            device_s=t_dev,
            total_s=time.perf_counter() - t_start,
            backend="+".join(sorted({c.backend for c in chunks})),
            chunks=len(chunks),
        )
        if not fetch:
            return None

        results: list[np.ndarray | None] = [None] * len(imgs)
        repaired = 0
        for chunk in chunks:
            rgb, risk, _ = chunk.out
            rgb_h = np.asarray(jax.device_get(rgb)).astype(np.int32)
            risk_h = np.asarray(jax.device_get(risk)) if self.strict else None
            coeffs_h = chunk.coeffs
            for bi, i in enumerate(chunk.indices):
                img = chunk.imgs[bi]
                out = rgb_h[bi]
                if self.strict:
                    mask = unpack_mask(risk_h[bi], img.width)
                    if mask.any():
                        if coeffs_h is None:  # fsm path: fetch lazily
                            coeffs_h = np.asarray(jax.device_get(chunk.coeffs_dev))
                        _repair(img, coeffs_h[bi], out, mask)
                        repaired += int(mask.sum())
                results[i] = out.astype(np.uint8)
        self.stats.repaired_pixels = repaired
        self.stats.total_s = time.perf_counter() - t_start
        return results  # type: ignore[return-value]

    def decode(
        self, datas: list[bytes], fetch: bool = True, on_error: str = "raise"
    ):
        """Parse + decode a batch of JPEG byte strings.

        on_error: 'raise' propagates the first malformed stream;
        'skip' isolates failures — bad entries yield None (fetch=True) and
        the failure list lands in stats (the per-item retry/skip policy the
        reference lacks entirely; SURVEY §6 failure detection).
        """
        t0 = time.perf_counter()
        if on_error == "raise":
            imgs = list(self.pool.map(parse, datas))
            bad: dict[int, str] = {}
        elif on_error == "skip":
            imgs, bad = [], {}
            for i, res in enumerate(
                self.pool.map(lambda d: _try_parse(d), datas)
            ):
                if isinstance(res, JpegImage):
                    imgs.append(res)
                else:
                    bad[i] = res
        else:
            raise ValueError(f"on_error={on_error!r}")
        t_parse = time.perf_counter() - t0
        out = self.decode_parsed(imgs, fetch=fetch)
        self.stats.parse_s = t_parse
        self.stats.total_s += t_parse
        self.stats.failures = bad
        if bad and out is not None:
            full: list = []
            it = iter(out)
            for i in range(len(datas)):
                full.append(None if i in bad else next(it))
            return full
        return out


def _try_parse(data: bytes):
    try:
        return parse(data)
    except JpegError as e:
        return str(e)
