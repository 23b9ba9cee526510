import numpy as np
import jax.numpy as jnp

import torch_random_walk_tpu as trw

# Fixture from /root/reference/tests/test_rw_triples.py:12-36.
TRIPLES = [(0, 5, 1), (1, 6, 3), (0, 5, 2), (2, 6, 4), (2, 7, 1),
           (0, 6, 3), (3, 7, 0), (3, 6, 2)]
PAD = 8  # r3 + 1, as the reference test picks it


def toy_triples():
    return trw.TriplesGraph.from_arrays(np.array(TRIPLES), num_entities=5)


def test_shape_contract():
    g = toy_triples()
    walks = trw.walk_triples(g, target_nodes=jnp.arange(5, dtype=jnp.int32),
                             walk_length=4, padding_idx=PAD, seed=20)
    assert walks.shape == (5, 9)  # (N, 2L+1), rw_cpu_triples.cpp:119


def test_walk_structure_and_validity():
    g = toy_triples()
    triple_set = set(TRIPLES)
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 40)
    walks = np.asarray(
        trw.walk_triples(g, target_nodes=targets, walk_length=5,
                         padding_idx=PAD, seed=3)
    )
    heads_with_triples = {h for h, _, _ in TRIPLES}
    for row in walks:
        for s in range(1, len(row) - 1, 2):
            h, r, t = row[s - 1], row[s], row[s + 1]
            if h == PAD or h not in heads_with_triples:
                # absorbed or dead end: pair must be (PAD, PAD)
                assert (r, t) == (PAD, PAD)
            else:
                assert (h, r, t) in triple_set, f"({h},{r},{t}) not a triple"


def test_padding_absorbing():
    """Entity 4 (E) has no outgoing triples: first pair is (pad, pad) and the
    walk stays absorbed (rw_cpu_triples.cpp:38-42)."""
    g = toy_triples()
    walks = trw.walk_triples(g, target_nodes=jnp.array([4], jnp.int32),
                             walk_length=3, padding_idx=PAD, seed=0)
    np.testing.assert_array_equal(np.asarray(walks),
                                  [[4, PAD, PAD, PAD, PAD, PAD, PAD]])


def test_restart_param_accepted_and_ignored():
    """Matches the reference's dead parameter (rw_cpu_triples.cpp:53)."""
    g = toy_triples()
    t = jnp.arange(5, dtype=jnp.int32)
    w1 = trw.walk_triples(g, target_nodes=t, walk_length=4, padding_idx=PAD,
                          seed=20, restart=True)
    w2 = trw.walk_triples(g, target_nodes=t, walk_length=4, padding_idx=PAD,
                          seed=20, restart=False)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_uniform_over_head_triples():
    g = toy_triples()
    num = 20000
    walks = np.asarray(
        trw.walk_triples(g, target_nodes=jnp.zeros(num, jnp.int32),
                         walk_length=1, padding_idx=PAD, seed=77)
    )
    # Head 0 has 3 triples; each should be hit w.p. 1/3.
    pairs = [(r, t) for r, t in walks[:, 1:3]]
    from collections import Counter
    counts = Counter(pairs)
    assert set(counts) == {(5, 1), (5, 2), (6, 3)}
    for c in counts.values():
        np.testing.assert_allclose(c / num, 1 / 3, atol=0.02)
