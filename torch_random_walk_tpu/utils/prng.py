"""Counter-based, stateless PRNG for walker sampling.

Design
------
Every random draw in this framework is a *pure function* of

    (seed, stream, step, round, walker_id)

with no carried RNG state.  This is the TPU-native replacement for the
reference's stateful RNGs (``srand``/``rand()`` on CPU,
``curand_init(seed, thread_id, offset)`` per CUDA thread — see
/root/reference/csrc/cpu/rw_cpu.cpp:60 and
/root/reference/csrc/cuda/rw_cuda.cu:72-73).  The reference's GPU contract is
"one independent stream per walker, derived from (seed, walker_id, offset)";
ours has the same shape but is *stronger*: because draws are keyed on the
global walker id, a walk batch produces bit-identical results regardless of
how walkers are sharded across chips, and regardless of backend (CPU / TPU /
Pallas kernel), since the same threefry function is evaluated everywhere.

Implementation is Threefry-2x32 (the same generator JAX uses), written in
plain uint32 jnp ops so the identical code runs inside Pallas kernels.
Verified bit-exact against ``jax.extend.random.threefry_2x32`` in
tests/test_prng.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Threefry-2x32 rotation constants (Salmon et al., SC'11).
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)

# Stream ids: one per independent consumer of randomness.  Adding a stream
# never perturbs existing ones.
STREAM_CSR_UNIFORM = 0
STREAM_CSR_BIASED = 1
STREAM_EDGE_UNIFORM = 2
STREAM_EDGE_BIASED = 3
STREAM_TRIPLES = 4
STREAM_WINDOWS_SG = 5
STREAM_WINDOWS_CBOW = 6
STREAM_WINDOWS_TRIPLES_SG = 7
STREAM_WINDOWS_TRIPLES_CBOW = 8
STREAM_TRAIN = 9
STREAM_KGE_NEG = 10

# Max rejection rounds folded into one step's counter space.  Each
# (step, round) pair gets a disjoint counter, so rounds are independent.
MAX_ROUNDS_PER_STEP = 1 << 16


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32: 20 rounds, bit-exact with JAX's generator.

    k0, k1: uint32 key words (scalars or arrays broadcastable with counters).
    c0, c1: uint32 counter words (arrays; the vectorized axis).
    Returns two uint32 arrays, each an independent random word per counter.

    Pure jnp uint32 arithmetic — usable unchanged inside Pallas TPU kernels.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks2 = k0 ^ k1 ^ _PARITY
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1

    ks = (k0, k1, ks2)
    for group in range(5):
        rots = _ROTATIONS[0:4] if group % 2 == 0 else _ROTATIONS[4:8]
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(group + 1) % 3]
        x1 = x1 + ks[(group + 2) % 3] + np.uint32(group + 1)
    return x0, x1


def derive_key(seed, stream):
    """Derive a (k0, k1) uint32 key pair from a user seed and a stream id.

    ``seed`` may be a Python int (any sign/width; folded to 64 bits) or a
    traced int32/uint32 scalar.
    """
    if isinstance(seed, (int, np.integer)):
        seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        s_lo = np.uint32(seed & 0xFFFFFFFF)
        s_hi = np.uint32(seed >> 32)
    else:
        s = jnp.asarray(seed)
        s_lo = s.astype(jnp.uint32)
        s_hi = jnp.zeros((), jnp.uint32)
    return threefry2x32(s_lo, s_hi, jnp.uint32(stream), jnp.uint32(0x9E3779B9))


def counter_bits(key, c0, c1):
    """Two independent uint32 words per (c0, c1) counter pair."""
    return threefry2x32(key[0], key[1], c0, c1)


def step_round_counter(step, round_idx=0):
    """Pack (step, round) into the c1 counter word."""
    step = jnp.asarray(step, jnp.uint32)
    return step * jnp.uint32(MAX_ROUNDS_PER_STEP) + jnp.asarray(round_idx, jnp.uint32)


def uniform_from_bits(bits):
    """uint32 bits -> float32 uniform in [0, 1).

    Uses the top 24 bits so the result is exactly representable and < 1.
    """
    return (bits >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def mulhi32(a, b):
    """High 32 bits of the 32x32 -> 64 unsigned product, in pure uint32 ops
    (no x64 requirement; runs unchanged inside Pallas kernels)."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    mask = np.uint32(0xFFFF)
    a_lo, a_hi = a & mask, a >> np.uint32(16)
    b_lo, b_hi = b & mask, b >> np.uint32(16)
    t = a_hi * b_lo + ((a_lo * b_lo) >> np.uint32(16))
    u = a_lo * b_hi + (t & mask)
    return a_hi * b_hi + (t >> np.uint32(16)) + (u >> np.uint32(16))


def randint_from_bits(bits, n):
    """uint32 bits -> int32 uniform in [0, n) (n >= 1, may be a traced array).

    Multiply-shift: floor(bits * n / 2^32) — exact full-range for any
    n < 2^31 (the >2^24 id spaces of ogbn-papers100M-class graphs included;
    a 24-bit float path would leave most of such a vocabulary unreachable).
    Per-value bias is <= n/2^32, strictly better than the modulo bias of the
    reference's ``rand() % n`` (/root/reference/csrc/cpu/rw_cpu.cpp:20).
    """
    return mulhi32(bits, n).astype(jnp.int32)
