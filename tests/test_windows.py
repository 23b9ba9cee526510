import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu.ops import windows as W

NUM_NODES = 20


def fixed_walks():
    rng = np.random.RandomState(20)
    return jnp.asarray(rng.randint(0, NUM_NODES, size=(7, 10)), jnp.int32)


def test_skipgram_shapes_and_content():
    walks = fixed_walks()
    ws = 5
    tgt, pos, neg = W.to_windows(walks, ws, NUM_NODES, seed=1)
    num_win = (10 - ws + 1) * 7  # (L - W + 1) * num_walks, windows_cpu.cpp:20
    assert tgt.shape == (num_win,)
    assert pos.shape == (num_win, ws - 1)
    assert neg.shape == (num_win, ws - 1)
    wn = np.asarray(walks)
    tgt, pos, neg = map(np.asarray, (tgt, pos, neg))
    mid = ws // 2
    per_walk = 10 - ws + 1
    # walk-major layout + middle-target + rest-of-window positives
    for wi in range(7):
        for si in range(per_walk):
            k = wi * per_walk + si
            win = wn[wi, si:si + ws]
            assert tgt[k] == win[mid]
            np.testing.assert_array_equal(
                pos[k], np.concatenate([win[:mid], win[mid + 1:]])
            )
    assert neg.min() >= 0 and neg.max() < NUM_NODES


def test_skipgram_negative_distribution():
    walks = fixed_walks()
    _, _, neg = W.to_windows(walks, 3, NUM_NODES, seed=5)
    neg = np.asarray(neg).ravel()
    counts = np.bincount(neg, minlength=NUM_NODES) / neg.size
    np.testing.assert_allclose(counts, 1 / NUM_NODES, atol=0.05)


def test_cbow_shapes_and_negative_excludes_positive():
    walks = fixed_walks()
    ws = 5
    pos_nodes, neg_nodes, ctx = W.to_windows_cbow(walks, ws, NUM_NODES, seed=2)
    num_win = (10 - ws + 1) * 7
    assert pos_nodes.shape == (num_win,)
    assert neg_nodes.shape == (num_win,)
    assert ctx.shape == (num_win, ws - 1)
    pn, nn = np.asarray(pos_nodes), np.asarray(neg_nodes)
    assert np.all(pn != nn), "negative node must differ from positive"
    assert nn.min() >= 0 and nn.max() < NUM_NODES


def _ref_triples_windows(walks, window_size, padding_idx):
    """Brute-force NumPy port of the reference loop geometry
    (windows_cpu.cpp:209-285) with the corrected left-window head."""
    nw, width = walks.shape
    per = (width - 1) // 2
    tgts = np.zeros((nw * per, 3), np.int64)
    wins = np.zeros((nw * per, 2 * window_size, 3), np.int64)
    for wi in range(nw):
        ti = 0
        for rel in range(1, width - 1, 2):
            k = wi * per + ti
            tgts[k] = walks[wi, rel - 1], walks[wi, rel], walks[wi, rel + 1]
            for hop in range(window_size):
                ri = rel - (hop + 1) * 2
                for c, idx in enumerate((ri - 1, ri, ri + 1)):
                    wins[k, hop, c] = walks[wi, idx] if idx >= 0 else padding_idx
            for hop in range(window_size):
                ri = rel + (hop + 1) * 2
                for c, idx in enumerate((ri - 1, ri, ri + 1)):
                    wins[k, hop + window_size, c] = (
                        walks[wi, idx] if idx < width else padding_idx
                    )
            ti += 1
    return tgts, wins


def test_triples_skipgram_matches_reference_geometry():
    rng = np.random.RandomState(7)
    walks = jnp.asarray(rng.randint(0, 8, size=(3, 9)), jnp.int32)  # L=4
    triples = jnp.asarray(rng.randint(0, 8, size=(10, 3)), jnp.int32)
    ws, pad = 2, 99
    tgt, pos, neg = W.to_windows_triples(walks, ws, 8, pad, triples, seed=3)
    exp_t, exp_w = _ref_triples_windows(np.asarray(walks), ws, pad)
    assert tgt.shape == (12, 3) and pos.shape == (12, 2 * ws, 3)
    np.testing.assert_array_equal(np.asarray(tgt), exp_t)
    np.testing.assert_array_equal(np.asarray(pos), exp_w)
    # negatives are real triples from the table
    tset = {tuple(r) for r in np.asarray(triples).tolist()}
    for row in np.asarray(neg).reshape(-1, 3):
        assert tuple(row) in tset


def test_triples_cbow_shapes_and_negatives():
    rng = np.random.RandomState(8)
    walks = jnp.asarray(rng.randint(0, 8, size=(4, 9)), jnp.int32)
    triples = jnp.asarray(
        np.unique(rng.randint(0, 8, size=(30, 3)), axis=0), jnp.int32
    )
    ws, pad = 2, 99
    pos_t, neg_t, pos_w = W.to_windows_triples_cbow(walks, ws, 8, pad,
                                                    triples, seed=4)
    assert pos_t.shape == (16, 3)
    assert neg_t.shape == (16, 3)
    assert pos_w.shape == (16, 2 * ws, 3)
    exp_t, exp_w = _ref_triples_windows(np.asarray(walks), ws, pad)
    np.testing.assert_array_equal(np.asarray(pos_t), exp_t)
    np.testing.assert_array_equal(np.asarray(pos_w), exp_w)
    tset = {tuple(r) for r in np.asarray(triples).tolist()}
    for p, n in zip(np.asarray(pos_t), np.asarray(neg_t)):
        assert tuple(n) in tset


def test_windows_deterministic():
    walks = fixed_walks()
    a = W.to_windows(walks, 5, NUM_NODES, seed=9)
    b = W.to_windows(walks, 5, NUM_NODES, seed=9)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
