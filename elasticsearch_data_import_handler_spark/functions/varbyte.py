"""Delta + varbyte posting-list codec with block-max metadata (numpy-vectorized).

The index format (SURVEY.md §1.2 / §2C C8): per ``(term, salt)`` group the
doc_ids are sorted ascending, delta-encoded, then varbyte (LEB128-style,
7 data bits per byte, high bit = continuation) compressed.  tf and doc_len
streams are varbyte'd without deltas.  Blocks of ``BLOCK_SIZE`` postings carry
``(max_doc, max_tf, max_score)`` so the query path can do block-max WAND
pruning (Ding & Suel, SIGIR'11 — public literature) without decoding.

Everything here is numpy-vectorized: these kernels run inside
``applyInPandas`` groups on executors, so no per-row Python is allowed
(BASELINE.json input_hint mandate).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int64/uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1), found by repeated shifts
    nbytes = np.ones(v.size, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    work = v.copy()
    for _ in range(9):
        more = work >= thresh
        if not more.any():
            break
        nbytes[more] += 1
        work = work >> np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # write byte j of every value that has > j bytes
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        idx = offsets[:-1][mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0  # terminal byte of each value
    n = int(ends.sum())
    # value index for every byte: cumsum of ends shifted right by one
    val_id = np.zeros(b.size, dtype=np.int64)
    val_id[1:] = np.cumsum(ends[:-1])
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.nonzero(ends)[0][:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - starts[val_id]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, val_id, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64))
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value kept, then gaps.  Input must be strictly increasing."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 (doc_ids are xxhash64 outputs, i.e. signed)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(np.int64)


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
                        idf: float, avgdl: float, k1: float = 1.2, b: float = 0.75):
    """Encode one (term, salt) posting list.

    doc_ids: int64 (signed, xxhash64-derived), will be sorted ascending.
    Returns (n_docs, block_meta, doc_ids_vb, tfs_vb, dls_vb) where block_meta
    is a list of (max_doc:int, max_tf:int, max_score:float) per 128-block.

    Note: we store doc_len per posting (``dls_vb``) so query-time scoring is
    exact without a doc_stats join — deviates from FIXTURES.md §4 by one
    column, documented there as the score-exactness requirement.
    """
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    dl = np.asarray(doc_lens, dtype=np.int64)[order]
    n = d.size
    # delta over zigzag(doc_id) keeps gaps small only if ids cluster; xxhash64
    # ids are uniform, so gaps are ~2^64/df — varbyte still caps at 10 bytes
    # and compresses tf/dl streams hard.  Sorted order is what WAND requires.
    u = d.astype(np.uint64) ^ np.uint64(1 << 63)  # order-preserving signed→unsigned
    gaps = delta_encode(u)
    scores = bm25_partial(t, dl, idf, avgdl, k1, b)
    meta = []
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        meta.append((int(d[e - 1]), int(t[s:e].max()), float(scores[s:e].max())))
    return (
        int(n),
        meta,
        varbyte_encode(gaps),
        varbyte_encode(t.astype(np.uint64)),
        varbyte_encode(dl.astype(np.uint64)),
    )


def decode_posting_list(doc_ids_vb: bytes, tfs_vb: bytes, dls_vb: bytes):
    """Inverse of :func:`encode_posting_list` → (doc_ids int64 asc, tfs, dls)."""
    u = delta_decode(varbyte_decode(doc_ids_vb))
    d = (u ^ np.uint64(1 << 63)).astype(np.int64)
    t = varbyte_decode(tfs_vb).astype(np.int64)
    dl = varbyte_decode(dls_vb).astype(np.int64)
    return d, t, dl


def bm25_partial(tfs: np.ndarray, doc_lens: np.ndarray, idf: float, avgdl: float,
                 k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """Vectorized per-posting BM25 contribution: idf * tf/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(doc_lens, dtype=np.float64)
    return idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
