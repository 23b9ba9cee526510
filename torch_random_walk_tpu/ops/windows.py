"""Walk -> training-window generators (skip-gram / CBOW, node and triple).

Re-creates the four generators in /root/reference/csrc/cpu/windows_cpu.cpp
and csrc/cuda/windows_cuda.cu as pure vectorized jnp: window extraction is
static strided slicing, negatives are one threefry draw per slot — no kernels
needed (SURVEY.md §7 layer 3).  Shape contracts (SURVEY.md §5):

- to_windows:       (num_win,), (num_win, W-1), (num_win, W-1) with
                    num_win = (L - W + 1) * num_walks, walk-major layout
                    (windows_cpu.cpp:20-26, :49).
- to_windows_cbow:  (num_win,), (num_win,), (num_win, W-1).
- to_windows_triples[(.*)cbow]: targets (num_win, 3), windows (num_win, 2W, 3)
                    with num_win = ((walk_width - 1) / 2) * num_walks
                    (windows_cpu.cpp:178-185).

Documented divergences from the reference (intent kept, bugs fixed):
- left-window heads use walk[head_idx], not the reference's walk[rel_idx]
  copy bug (windows_cpu.cpp:230, windows_cuda.cu:295 — SURVEY.md §2.6);
- the reference's CPU chunking bug (every parallel chunk writes all walks,
  windows_cpu.cpp:38-39) does not arise — generation is functionally pure;
- CBOW negative nodes are *exactly* uniform over [0, num_nodes) minus {pos}
  (draw u in [0, n-1), shift past pos) instead of resample-up-to-100×
  (windows_cpu.cpp:130-135);
- CBOW negative triples retry collision a fixed 4 rounds (vs 100 sequential
  retries) — beyond-4 collision probability is negligible for any real
  triples table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from torch_random_walk_tpu.utils import prng


def _neg_bits(stream, seed, shape):
    """Independent uint32 bits per output slot, keyed by flat slot index."""
    key = prng.derive_key(seed, stream)
    n = 1
    for s in shape:
        n *= s
    ids = jnp.arange(n, dtype=jnp.uint32)
    b0, _ = prng.counter_bits(key, ids, jnp.zeros_like(ids))
    return b0.reshape(shape)


def _sliding(walks, window_size):
    """(num_walks, L) -> (num_walks, L-W+1, W) sliding windows (static gather)."""
    length = walks.shape[1]
    per_walk = length - window_size + 1
    idx = jnp.arange(per_walk)[:, None] + jnp.arange(window_size)[None, :]
    return walks[:, idx], per_walk


@partial(jax.jit, static_argnames=("window_size", "num_nodes"))
def to_windows(walks, window_size, num_nodes, seed=0):
    """Skip-gram windows (windows_cpu.cpp:5-77): target = window middle,
    positives = other W-1 elements, negatives = uniform nodes."""
    win, per_walk = _sliding(walks, window_size)
    num_walks = walks.shape[0]
    num_win = num_walks * per_walk
    mid = window_size // 2
    targets = win[:, :, mid].reshape(num_win)
    pos = jnp.concatenate([win[:, :, :mid], win[:, :, mid + 1:]], axis=-1)
    pos = pos.reshape(num_win, window_size - 1)
    bits = _neg_bits(prng.STREAM_WINDOWS_SG, seed, (num_win, window_size - 1))
    neg = prng.randint_from_bits(bits, num_nodes).astype(walks.dtype)
    return targets, pos, neg


@partial(jax.jit, static_argnames=("window_size", "num_nodes"))
def to_windows_cbow(walks, window_size, num_nodes, seed=0):
    """CBOW windows (windows_cpu.cpp:80-159): one exact-uniform negative node
    per window, guaranteed != positive."""
    win, per_walk = _sliding(walks, window_size)
    num_walks = walks.shape[0]
    num_win = num_walks * per_walk
    mid = window_size // 2
    pos_nodes = win[:, :, mid].reshape(num_win)
    context = jnp.concatenate([win[:, :, :mid], win[:, :, mid + 1:]], axis=-1)
    context = context.reshape(num_win, window_size - 1)
    bits = _neg_bits(prng.STREAM_WINDOWS_CBOW, seed, (num_win,))
    u = prng.randint_from_bits(bits, max(num_nodes - 1, 1)).astype(walks.dtype)
    neg_nodes = u + (u >= pos_nodes).astype(walks.dtype)
    return pos_nodes, neg_nodes, context


def _triples_targets_and_windows(walks, window_size, padding_idx):
    """Shared geometry for the two triples generators.

    Target triples sit at every odd (relation) position i of the
    [v0, r1, v1, ...] walk; context slots are ``window_size`` triples to the
    left and right at stride 2, padded component-wise outside the walk
    (windows_cpu.cpp:209-285 boundary semantics)."""
    num_walks, width = walks.shape
    per_walk = (width - 1) // 2
    rel_pos = 1 + 2 * jnp.arange(per_walk)  # (per_walk,)

    targets = jnp.stack(
        [walks[:, rel_pos - 1], walks[:, rel_pos], walks[:, rel_pos + 1]],
        axis=-1,
    ).reshape(num_walks * per_walk, 3)

    hops = jnp.arange(window_size) + 1
    left = rel_pos[:, None] - 2 * hops[None, :]            # (per_walk, W)
    right = rel_pos[:, None] + 2 * hops[None, :]
    rel_idx = jnp.concatenate([left, right], axis=1)        # (per_walk, 2W)

    def component(idx):
        valid = (idx >= 0) & (idx < width)
        g = walks[:, jnp.clip(idx, 0, width - 1)]           # (NW, per_walk, 2W)
        return jnp.where(valid[None, :, :], g,
                         jnp.asarray(padding_idx, walks.dtype))

    windows = jnp.stack(
        [component(rel_idx - 1), component(rel_idx), component(rel_idx + 1)],
        axis=-1,
    ).reshape(num_walks * per_walk, 2 * window_size, 3)
    return targets, windows


@partial(jax.jit, static_argnames=("window_size", "num_nodes", "padding_idx"))
def to_windows_triples(walks, window_size, num_nodes, padding_idx, triples,
                       seed=0):
    """Triples skip-gram windows (windows_cpu.cpp:161-310): negatives are
    2*window_size uniformly sampled *real* triples per window."""
    targets, pos_windows = _triples_targets_and_windows(walks, window_size,
                                                        padding_idx)
    num_win = targets.shape[0]
    num_triples = triples.shape[0]
    bits = _neg_bits(prng.STREAM_WINDOWS_TRIPLES_SG, seed,
                     (num_win, 2 * window_size))
    idx = prng.randint_from_bits(bits, num_triples)
    neg_windows = triples[idx].astype(walks.dtype)
    return targets, pos_windows, neg_windows


@partial(jax.jit, static_argnames=("window_size", "num_nodes", "padding_idx"))
def to_windows_triples_cbow(walks, window_size, num_nodes, padding_idx,
                            triples, seed=0):
    """Triples CBOW windows (windows_cpu.cpp:312-475): one negative triple per
    window, resampled on exact-match collision with the positive."""
    pos_triples, pos_windows = _triples_targets_and_windows(walks, window_size,
                                                            padding_idx)
    num_win = pos_triples.shape[0]
    num_triples = triples.shape[0]
    rounds = 4
    bits = _neg_bits(prng.STREAM_WINDOWS_TRIPLES_CBOW, seed, (num_win, rounds))
    idx = prng.randint_from_bits(bits, num_triples)         # (num_win, rounds)
    cands = triples[idx].astype(walks.dtype)                # (num_win, rounds, 3)
    collides = jnp.all(cands == pos_triples[:, None, :], axis=-1)
    # First non-colliding round; fall back to the last draw.
    pick = jnp.argmax(~collides, axis=1)
    pick = jnp.where(jnp.all(collides, axis=1), rounds - 1, pick)
    neg_triples = jnp.take_along_axis(cands, pick[:, None, None], axis=1)
    return pos_triples, neg_triples[:, 0, :], pos_windows
