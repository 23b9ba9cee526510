"""Per-node Bloom filters over out-neighbor sets.

The node2vec distance-1 test ``cand in N(t)`` is the expensive part of the
rejection loop: exact answers need cuckoo-table gathers (ops/fatwalk.py) or,
partitioned, a round trip to t's owner (parallel/partition_v2.py).  But the
overwhelmingly common answer on sparse graphs is *no* — and a Bloom filter
has no false negatives, so a negative probe decides the acceptance threshold
(exactly prob_2) with zero gathers and zero traffic.  Positives (a few
percent at typical degrees) fall back to the exact test, so walks remain
bit-identical to the exact engines.

Two widths: 128 bits (4 words — partitioned walker records) and 96 bits
(3 words — embedded in the single-chip wide fat rows next to the packed
meta and the reverse-multiplicity byte).  2 multiply-shift probes per
neighbor; false-positive rate at degree 16 is ~5% (128b) / ~8% (96b); hubs
saturate to all-ones, which simply disables the shortcut for them (correct,
just slower).

Reference semantics served: the ``is_neighbor`` scan of
/root/reference/csrc/cpu/rw_cpu.cpp:32-56 — here reduced to a register test
for the common case.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BLOOM_WORDS = 4  # default width (partitioned records)
BLOOM_MULS = (0x9E3779B9, 0x85EBCA6B)


def bloom_positions_np(x, words: int = BLOOM_WORDS):
    """Bit positions (one per probe) for values x — identical math to the
    jnp probe in bloom_maybe().  Position = mulhi(hash, 32 * words)."""
    x = np.asarray(x, np.uint64)
    bits = np.uint64(32 * words)
    out = []
    for m in BLOOM_MULS:
        h = (x * np.uint64(m)) & np.uint64(0xFFFFFFFF)
        out.append((h * bits) >> np.uint64(32))
    return out


def build_node_blooms(row_ptr, col_idx, words: int = BLOOM_WORDS) -> np.ndarray:
    """(N, words) uint32: per-node Bloom filter over its out-neighbors."""
    row_ptr = np.asarray(row_ptr)
    col_idx = np.asarray(col_idx)
    n = row_ptr.shape[0] - 1
    blooms = np.zeros((n, words), np.uint32)
    heads = np.repeat(np.arange(n), np.diff(row_ptr))
    for pos in bloom_positions_np(col_idx, words):
        word = (pos >> np.uint64(5)).astype(np.int64)
        bit = np.uint32(1) << (pos & np.uint64(31)).astype(np.uint32)
        np.bitwise_or.at(blooms, (heads, word), bit)
    return blooms


def bloom_maybe(bloom_rows, cand, words: int = BLOOM_WORDS):
    """jnp: True unless the filter proves ``cand`` is not in the set.

    bloom_rows: (..., words) uint32 (one filter per lane); cand: (...,)
    int32.  Pure VPU — the word select is an arithmetic W-way select.
    """
    x = cand.astype(jnp.uint32)
    bits = jnp.uint32(32 * words)
    hit = jnp.ones(cand.shape, bool)
    for m in BLOOM_MULS:
        h = x * jnp.uint32(m)
        # mulhi(h, 32*words): position in [0, 32*words).
        from torch_random_walk_tpu.utils.prng import mulhi32

        pos = mulhi32(h, bits)
        word = pos >> jnp.uint32(5)
        bit = jnp.uint32(1) << (pos & jnp.uint32(31))
        w = bloom_rows[..., words - 1]
        for k in range(words - 2, -1, -1):
            w = jnp.where(word == k, bloom_rows[..., k], w)
        hit &= (w & bit) != 0
    return hit


def build_edge_multiplicities(row_ptr, col_idx) -> np.ndarray:
    """(E,) uint32, packed rev | own << 16 per edge e = (u -> w):

    - rev = multiplicity of the reverse edge (w -> u): how many times u
      appears in w's row.  At walk state (t, v), entered via edge (t -> v),
      this is the mixture sampler's spike mass mult_v(t).
    - own = multiplicity of (u -> w) itself.  When the spike fires (the
      walk returns to t), the new state (v', t') = (v, t)'s spike mass is
      mult_t(v) = own(t -> v) — so a spike advance just swaps the halves.

    Each half saturates at 0xFFFF (graphs with > 65535 parallel copies of
    one edge would quantize the spike mass — far beyond any real dataset).
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_idx = np.asarray(col_idx, np.int64)
    n = row_ptr.shape[0] - 1
    heads = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    keys = heads << np.int64(32) | col_idx  # sorted: CSR order == key order
    rev_keys = col_idx << np.int64(32) | heads
    rev = (np.searchsorted(keys, rev_keys, side="right")
           - np.searchsorted(keys, rev_keys, side="left"))
    own = (np.searchsorted(keys, keys, side="right")
           - np.searchsorted(keys, keys, side="left"))
    rev = np.minimum(rev, 0xFFFF).astype(np.uint32)
    own = np.minimum(own, 0xFFFF).astype(np.uint32)
    return rev | (own << np.uint32(16))
