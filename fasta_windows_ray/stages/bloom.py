"""Bloom-filter runtime pushdown for big-big semi-joins.

`joins.semi_join` broadcasts the EXACT key set — right at the ~10^6-key
scale, wrong at 10^9 (the set itself is GBs and every worker
deserializes it).  `joins.hash_join` co-partitions both sides — exact
at any scale, but the shuffle moves ALL left rows including the
(typically dominant) non-matching mass.

The Bloom shape in between is the standard engine trick (runtime
filter pushdown): summarize the right key set into an m-bit Bloom
filter (n_bits/8 bytes regardless of key count; OR-mergeable, so it
builds as per-batch partial bitmaps + a tree fold), broadcast it ONCE
(`ray.put`), and drop non-matching left rows BEFORE the exchange.
With k=4 hashes and m = 16n bits the false-positive rate is ~0.24%,
so the exact verify join shuffles ~the matching mass only.

Hash parity: build and probe hash the key column with the same
`pd.util.hash_pandas_object` used by the HLL sketch — key columns must
be the same dtype on both sides (int64 vs string hash differently).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketches import _hash_u64


def _bloom_positions(keys: pd.Series, n_bits: int,
                     n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via Kirsch-Mitzenmacher
    double hashing: pos_i = (h1 + i*h2) mod m, h2 forced odd so the
    probe sequence cycles the full (power-of-two) table."""
    h1 = _hash_u64(keys)
    # splitmix64 finalizer for an independent second hash
    z = (h1 + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


def build_bloom(ds, col: str, n_bits: int = 1 << 23,
                n_hashes: int = 4) -> np.ndarray:
    """Bloom filter of a Dataset column as a packed uint64 bitmap
    (n_bits/8 bytes).  Per-batch local bitmaps are OR-merged in a tree:
    a fold stage ORs ~32 partial bitmaps per task, the driver ORs the
    fold outputs — driver work is O(blocks/32 x n_bits/8 bytes), and
    the per-batch partial is emitted only when non-empty."""
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    n_words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        keys = t[col].to_pandas()
        bitmap = np.zeros(n_words, np.uint64)
        if len(keys):
            pos = _bloom_positions(keys, n_bits, n_hashes).ravel()
            np.bitwise_or.at(bitmap, pos >> 6,
                             np.uint64(1) << (pos.astype(np.uint64)
                                              & np.uint64(63)))
        return pa.table({"bm": pa.array([bitmap.tobytes()], pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, np.uint64)
        for buf in t["bm"].to_pylist():
            acc |= np.frombuffer(buf, np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    folded = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .map_batches(fold, batch_format="pyarrow", batch_size=32))
    out = np.zeros(n_words, np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        for buf in b["bm"].to_pylist():
            out |= np.frombuffer(buf, np.uint64)
    return out


def bloom_contains(bitmap: np.ndarray, keys: pd.Series,
                   n_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (no false negatives; false positives at the design FPR)."""
    n_bits = len(bitmap) * 64
    pos = _bloom_positions(keys, n_bits, n_hashes)
    bits = (bitmap[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) \
        & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_join(left, right, on: str, n_bits: int = 1 << 23,
                    n_hashes: int = 4, exact: bool = True):
    """Big-big semi-join: keep left rows whose ``on`` appears in right.

    1. Build the right-side Bloom (bounded bytes, tree-merged).
    2. Broadcast it once; vectorized probe drops non-matching left rows
       BEFORE any exchange (the runtime-filter pushdown).
    3. ``exact=True``: co-partitioned `hash_join` of the survivors
       against the DEDUPED right key column removes the residual false
       positives — dedup means inner join emits each left survivor at
       most once, i.e. exact semi-join semantics; the shuffle now
       carries ~matching-mass + FPR instead of all of left.
    ``exact=False`` returns the filtered Dataset as-is (the ~0.24%
    false-positive superset) for pre-pass / monitoring uses.
    """
    import ray

    bm_ref = ray.put(build_bloom(right, on, n_bits, n_hashes))

    def keep(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        mask = bloom_contains(bm, t[on].to_pandas(), n_hashes)
        return t.filter(pa.array(mask))

    filtered = left.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)
    if not exact:
        return filtered

    from .joins import hash_join

    def dedup_keys(t: pa.Table) -> pa.Table:
        arr = t[on].to_pandas().drop_duplicates()
        return pa.Table.from_pandas(arr.to_frame(on), preserve_index=False)

    keys = (right.map_batches(dedup_keys, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby(on).count()
                 .map_batches(lambda t: t.select([on]),
                              batch_format="pyarrow"))
    return hash_join(filtered, keys, on=on, how="inner")
