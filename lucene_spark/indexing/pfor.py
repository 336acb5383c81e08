"""Optional PFOR (patched frame-of-reference) posting-int codec.

Semantic parity with the reference's ``PForUtil``
(``core/codecs/lucene90/PForUtil.java:29,61-110``): integers are packed in
128-value sub-blocks at the bit width of the *non-exceptional* values; up to
``MAX_EXCEPTIONS = 7`` largest values are "patched out" — their low ``width``
bits stay in the packed array, their high bits are stored separately — and an
all-equal sub-block collapses to a run-length token (the reference's
"all values equal → single byte" case).

The north rule pins the DEFAULT postings compression to delta-gap + varint
(see ``blocks.py``); this codec is the documented-parity OPT-IN alternative
(``IndexBuilder(postings_codec="pfor")``). Buffers are self-describing via a
1-byte codec tag (``blocks.CODEC_PFOR``) added by the block encoder, so
readers dispatch per buffer and indexes with either codec are served by the
same kernels.

Stream layout (this codec is a byte-stream *container*, not byte-parity with
the reference's ``.doc`` file):

    sub-block := header(3B) payload
    header    := count-1 (1B, 0..127) | width (1B) | n_exceptions (1B)
    width 0xFE = run-length: payload is one LEB128 varint (the common value)
    width 0..64: payload = ceil(count*width/8) bytes of MSB-first packed low
        bits, then n_exceptions × (position 1B + LEB128 varint of the
        exception's high bits ``value >> width``)

A stream is a self-delimiting concatenation of sub-blocks, so concatenated
buffers decode in one sequential parse (the property the varint paths rely on
for whole-match batch decode).
"""

from __future__ import annotations

import numpy as np

MAX_EXCEPTIONS = 7  # PForUtil.java:29
SUB_BLOCK = 128  # ForUtil.BLOCK_SIZE (ForUtil.java:32)
_RLE_WIDTH = 0xFE  # header sentinel: run-length (all-equal) sub-block


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """MSB-first bit-pack ``values`` (< 2**width) at ``width`` bits each."""
    if width == 0 or values.size == 0:
        return b""
    v = values.astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf: bytes, count: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint64 array of ``count`` values."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         count=count * width)
    w = bits.reshape(count, width).astype(np.uint64)
    pows = np.left_shift(np.uint64(1),
                         np.arange(width - 1, -1, -1, dtype=np.uint64))
    return (w * pows).sum(axis=1, dtype=np.uint64)


def _varint_len(v: int) -> int:
    return max(1, (int(v).bit_length() + 6) // 7)


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_sub(v: np.ndarray) -> bytes:
    """Encode one ≤128-value sub-block, choosing the exception count that
    minimizes encoded bytes (PForUtil's cost model: each exception saves
    packed width for ALL values but costs its own patch entry)."""
    n = v.size
    if n == 0:
        return b""
    vmax = int(v.max())
    if int(v.min()) == vmax:  # all-equal → run-length token
        return bytes([n - 1, _RLE_WIDTH, 0]) + _encode_varint(vmax)
    order = np.argsort(v)  # ascending; exceptions = the e largest
    best = None
    max_e = min(MAX_EXCEPTIONS, n - 1)
    for e in range(max_e + 1):
        w = int(v[order[n - 1 - e]]).bit_length()
        exc_idx = order[n - e:] if e else order[:0]
        size = 3 + (n * w + 7) // 8 + sum(
            1 + _varint_len(int(v[i]) >> w) for i in exc_idx)
        if best is None or size < best[0]:
            best = (size, w, exc_idx)
    _, w, exc_idx = best
    low = v.astype(np.uint64) & ((np.uint64(1) << np.uint64(w)) - np.uint64(1)
                                 if w else np.uint64(0))
    out = bytearray([n - 1, w, exc_idx.size])
    out += pack_bits(low, w)
    for i in sorted(int(x) for x in exc_idx):
        out.append(i)
        out += _encode_varint(int(v[i]) >> w)
    return bytes(out)


def pfor_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as a PFOR sub-block stream."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if v.min() < 0:
        raise ValueError("pfor_encode requires non-negative values")
    parts = [
        _encode_sub(v[i: i + SUB_BLOCK]) for i in range(0, v.size, SUB_BLOCK)
    ]
    return b"".join(parts)


def pfor_decode(buf: bytes) -> np.ndarray:
    """Decode a PFOR sub-block stream → int64 array (inverse of encode,
    including concatenations of encoded streams)."""
    b = memoryview(buf)
    out: list[np.ndarray] = []
    pos = 0
    end = len(b)
    while pos < end:
        n = b[pos] + 1
        w = b[pos + 1]
        e = b[pos + 2]
        pos += 3
        if w == _RLE_WIDTH:
            val = 0
            shift = 0
            while True:
                byte = b[pos]
                pos += 1
                val |= (byte & 0x7F) << shift
                shift += 7
                if not byte & 0x80:
                    break
            out.append(np.full(n, val, dtype=np.int64))
            continue
        nbytes = (n * w + 7) // 8
        vals = unpack_bits(bytes(b[pos: pos + nbytes]), n, w)
        pos += nbytes
        for _ in range(e):
            idx = b[pos]
            pos += 1
            hi = 0
            shift = 0
            while True:
                byte = b[pos]
                pos += 1
                hi |= (byte & 0x7F) << shift
                shift += 7
                if not byte & 0x80:
                    break
            vals[idx] += np.uint64(hi) << np.uint64(w)
        out.append(vals.astype(np.int64))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)


def pfor_encode_grouped(values: np.ndarray,
                        group_starts: np.ndarray) -> list[bytes]:
    """Per-group PFOR encode (grouped-API parity with
    ``encode_varints_grouped``): group i covers
    ``values[group_starts[i]:group_starts[i+1]]``."""
    v = np.asarray(values, dtype=np.int64)
    gs = np.asarray(group_starts, dtype=np.int64)
    ends = np.concatenate([gs[1:], [v.size]]).astype(np.int64)
    return [pfor_encode(v[s:e]) for s, e in zip(gs.tolist(), ends.tolist())]
