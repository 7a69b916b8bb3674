"""tpujpeg — a TPU-native baseline-JPEG decode engine (JAX/XLA/Pallas).

Capability-parity rebuild of debesheedas/GPU-JPEG-Decoder, designed TPU-first:
host-side parsing + canonical Huffman tables, segment-parallel entropy decode,
and batched Pallas/XLA kernels for dequant + inverse zigzag + integer IDCT +
color conversion, sharded over device meshes with shard_map.
"""

from .errors import JpegError
from .io.parser import JpegImage, parse, parse_file

__version__ = "0.1.0"

__all__ = [
    "JpegError",
    "JpegImage",
    "parse",
    "parse_file",
    "decode",
    "decode_batch",
    "__version__",
]


def decode(data, backend: str = "tpu"):
    """Decode a JPEG (path or bytes) to an int32 [H, W, 3] RGB array."""
    img = parse_file(data) if isinstance(data, str) else parse(data)
    if backend == "oracle":
        from .oracle import decoder as oracle

        return oracle.decode(img)
    from . import pipeline

    return pipeline.decode(img)


def decode_batch(datas, backend: str = "auto", **kwargs):
    """Decode a batch of JPEG byte strings -> list of uint8 [H, W, 3].

    Thin wrapper over runtime.batch.BatchDecoder (geometry bucketing,
    pipelined host/device stages, host-native or device-FSM entropy).
    """
    from .runtime.batch import BatchDecoder

    return BatchDecoder(backend=backend, **kwargs).decode(list(datas))
