"""Alias-method categorical sampling (Vose construction).

Used for degree-weighted (unigram^0.75) negative sampling — the standard
word2vec/gensim negative distribution, which the reference does not offer
(its negatives are plain ``rand() % num_nodes``, windows_cpu.cpp:67-71;
uniform stays OUR default for parity).  TPU shape: the table build is
one-time host NumPy; a draw is two table gathers + a select, O(1) per
sample with no rejection loop or cumulative-sum search.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu.utils import prng


def build_alias(weights) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vose alias tables for a categorical over ``weights`` (any
    nonnegative, not all zero).  Returns (prob f32[N], alias int32[N]).
    """
    w = np.asarray(weights, np.float64).ravel()
    n = w.shape[0]
    if n == 0 or not np.all(w >= 0) or w.sum() == 0:
        raise ValueError("weights must be nonempty, nonnegative, nonzero")
    scaled = w * (n / w.sum())
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    # Leftovers are 1.0 within float error.
    return (jnp.asarray(prob.astype(np.float32)),
            jnp.asarray(alias.astype(np.int32)))


def sample_alias(prob, alias, bits_slot, bits_coin):
    """Draw categorical ids from alias tables; one id per uint32 bit pair.

    bits_slot picks the table slot (full-range multiply-high), bits_coin
    the keep-vs-alias coin.  Pure function of the bits — determinism and
    sharding-invariance follow from the caller's counter scheme.
    """
    n = prob.shape[0]
    slot = prng.randint_from_bits(bits_slot, n).astype(jnp.int32)
    # Map uint32 -> [0, 1) with 24-bit resolution (exact in f32).
    u = (bits_coin >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u < prob[slot], slot, alias[slot])


def degree75_weights(row_ptr) -> np.ndarray:
    """deg(v)^0.75 over CSR out-degrees (word2vec's unigram^{3/4} table;
    isolated nodes keep weight 0 and are never drawn)."""
    deg = np.diff(np.asarray(row_ptr)).astype(np.float64)
    return deg ** 0.75


def shared_negative_ids_alias(seed, num: int, prob, alias):
    """S negatives from the alias distribution on the same
    (seed, STREAM_TRAIN) counter stream as the uniform variant
    (models/skipgram.shared_negative_ids)."""
    key = prng.derive_key(seed, prng.STREAM_TRAIN)
    ids = jnp.arange(num, dtype=jnp.uint32)
    b0, b1 = prng.counter_bits(key, ids, jnp.zeros_like(ids))
    return sample_alias(prob, alias, b0, b1).astype(jnp.int32)
