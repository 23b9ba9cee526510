"""Cuckoo hash set over directed edges: exact O(1) neighbor-membership tests.

The node2vec rejection step needs ``is_neighbor(candidate, t)`` per walker per
round (/root/reference/csrc/cpu/rw_cpu.cpp:32-56 does an O(deg) scan; our jnp
reference path does an O(log deg) binary search — ops/common.is_neighbor_csr).
On TPU both are wrong-shaped: every search level is a full-batch scalar gather
at the gather engine's ~65M rows/s, so a 2^14-degree hub costs 14 serialized
gathers.  A cuckoo hash table answers membership in EXACTLY two (S, 2)-row
gathers (~172M rows/s each), independent of degree.

Build is host-side vectorized NumPy (last-write-wins scatter emulating the
atomic insert of GPU cuckoo builders): each pending key writes itself to its
current-choice slot; losers and evicted occupants flip their hash choice and
retry.  Load factor <= 0.25 (table size >= 4E rounded to a power of two), so
the random-walk insertion converges in a few dozen rounds w.h.p.; on the rare
non-convergence we rehash with fresh seeds.

Keys are (u, v) node pairs packed into 64 bits, stored as (S, 2) uint32 rows.
The empty sentinel is the all-ones row — unreachable for real node ids
(< 2^31).  Hash functions are multiplicative in uint32 (identical arithmetic
in NumPy and jnp, so host build and on-device queries always agree).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

_EMPTY = np.uint32(0xFFFFFFFF)

# Odd multiplicative constants per (hash index, word); re-derived per rehash
# attempt by xoring with a salt.
_H_CONSTS = (
    (0x9E3779B1, 0x85EBCA77),
    (0xC2B2AE3D, 0x27D4EB2F),
)


def _hash_np(lo, hi, salt: int, which: int, log_size: int):
    a, b = _H_CONSTS[which]
    a = np.uint32(a ^ salt)
    b = np.uint32(b ^ (salt * 0x9E3779B9 & 0xFFFFFFFF))
    h = lo * a + hi * b + np.uint32(which + 1)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x7FEB352D)
    h ^= h >> np.uint32(15)
    return (h >> np.uint32(32 - log_size)).astype(np.int64)


def _hash_jnp_traced(lo, hi, salt_u32, which: int, log_size: int):
    """Same hash as _hash_jnp with a *traced* uint32 salt (per-shard salts
    inside shard_map differ per device and cannot be Python ints)."""
    a, b = _H_CONSTS[which]
    a = jnp.uint32(a) ^ salt_u32
    b = jnp.uint32(b) ^ (salt_u32 * jnp.uint32(0x9E3779B9))
    h = lo * a + hi * b + jnp.uint32(which + 1)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    return (h >> jnp.uint32(32 - log_size)).astype(jnp.int32)


def _hash_jnp(lo, hi, salt: int, which: int, log_size: int):
    a, b = _H_CONSTS[which]
    a = jnp.uint32(a ^ salt)
    b = jnp.uint32((b ^ (salt * 0x9E3779B9)) & 0xFFFFFFFF)
    h = lo * a + hi * b + jnp.uint32(which + 1)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    return (h >> jnp.uint32(32 - log_size)).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class EdgeHashSet:
    """Static cuckoo set of directed (u, v) edges."""

    table: jnp.ndarray  # (S, 2) uint32 — (u, v) key rows; all-ones = empty
    log_size: int       # S == 1 << log_size
    salt: int

    @classmethod
    def from_edges(cls, src, dst, max_rounds: int = 256) -> "EdgeHashSet":
        table, log_size, salt = cls.host_build(src, dst, max_rounds)
        return cls(table=jnp.asarray(table), log_size=log_size, salt=salt)

    @classmethod
    def host_build(cls, src, dst, max_rounds: int = 256):
        """Build the table HOST-side: (numpy (S, 2) table, log_size, salt).
        Callers that cache tables on disk use this to avoid a device
        round-trip (jnp.asarray then np.asarray would ship the table over
        the TPU tunnel twice)."""
        n = np.asarray(src).shape[0]
        # 2.5x sizing -> load factor <= 0.4 (cuckoo-safe; the build retries
        # with log_size + 1 on failure).  The previous 4x sizing put the
        # ogbn-scale table at 2^28 rows, where the TPU gather engine slows
        # to ~60M rows/s — table size, not probe count, bounds the exact
        # distance-1 test (BENCHLOG.md).
        log_size = max(4, int(np.ceil(np.log2(max(2.5 * n, 16)))))
        try:
            return cls._host_build_with_log_size(src, dst, log_size,
                                                 max_rounds)
        except RuntimeError:
            return cls._host_build_with_log_size(src, dst, log_size + 1,
                                                 max_rounds)

    @classmethod
    def from_edges_with_log_size(cls, src, dst, log_size: int,
                                 max_rounds: int = 256) -> "EdgeHashSet":
        """Build with an explicit table size (e.g. shared across graph
        partitions so shard_map sees one static shape)."""
        table, log_size, salt = cls._host_build_with_log_size(
            src, dst, log_size, max_rounds)
        return cls(table=jnp.asarray(table), log_size=log_size, salt=salt)

    @classmethod
    def _host_build_with_log_size(cls, src, dst, log_size: int,
                                  max_rounds: int = 256):
        src = np.asarray(src, np.uint32)
        dst = np.asarray(dst, np.uint32)
        size = 1 << log_size

        # Native multi-threaded build when csrc/ is compiled (bit-compatible:
        # same hash family, layout and salt-retry policy).
        from torch_random_walk_tpu import native

        built = native.cuckoo_build(src.astype(np.int64),
                                    dst.astype(np.int64), log_size)
        if built is not None:
            table, salt = built
            return table, log_size, salt

        for salt in range(64):  # rehash attempts
            tbl_lo = np.full(size, _EMPTY, np.uint32)
            tbl_hi = np.full(size, _EMPTY, np.uint32)
            # Dedup keys (set semantics; parallel edges collapse).
            keys = (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)
            keys = np.unique(keys)
            lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (keys >> np.uint64(32)).astype(np.uint32)
            k = keys.shape[0]
            pending = np.arange(k)
            choice = np.zeros(k, np.int8)
            h01 = np.stack(
                [_hash_np(lo, hi, salt, 0, log_size),
                 _hash_np(lo, hi, salt, 1, log_size)], axis=1)
            ok = False
            for _ in range(max_rounds):
                if pending.size == 0:
                    ok = True
                    break
                pos = h01[pending, choice[pending]]
                old_lo = tbl_lo[pos].copy()
                old_hi = tbl_hi[pos].copy()
                tbl_lo[pos] = lo[pending]
                tbl_hi[pos] = hi[pending]
                landed = (tbl_lo[pos] == lo[pending]) & (tbl_hi[pos] == hi[pending])
                # Occupants overwritten by a landing key get evicted.
                ev_lo = old_lo[landed]
                ev_hi = old_hi[landed]
                real = ~((ev_lo == _EMPTY) & (ev_hi == _EMPTY))
                ev_keys = (ev_hi[real].astype(np.uint64) << np.uint64(32)) | ev_lo[real]
                ev_idx = np.searchsorted(keys, ev_keys)
                choice[ev_idx] ^= 1
                pending = np.concatenate([pending[~landed], ev_idx])
            if ok:
                return np.stack([tbl_lo, tbl_hi], axis=1), log_size, salt
        raise RuntimeError("cuckoo build failed to converge (pathological input)")

    def contains(self, u, v):
        """Vectorized membership: is (u, v) in the set?  Two row gathers."""
        lo = v.astype(jnp.uint32)   # key = (u << 32) | v
        hi = u.astype(jnp.uint32)
        hit = jnp.zeros(u.shape, bool)
        for which in range(2):
            pos = _hash_jnp(lo, hi, self.salt, which, self.log_size)
            row = self.table[pos]
            hit |= (row[..., 0] == lo) & (row[..., 1] == hi)
        return hit
