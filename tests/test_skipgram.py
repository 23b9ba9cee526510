import networkx as nx
import numpy as np
import pytest
import jax.numpy as jnp

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.models import Node2Vec, Node2VecConfig, SkipGramModel, CBOWModel
from torch_random_walk_tpu.ops.windows import to_windows, to_windows_cbow


def barbell_graph():
    """Two K5 cliques joined by one edge: embeddings must separate them."""
    g = nx.barbell_graph(5, 0)
    return trw.CSRGraph.from_networkx(g)


def test_skipgram_loss_decreases():
    csr = barbell_graph()
    import optax

    model = SkipGramModel(csr.num_nodes, dim=16, optimizer=optax.adam(5e-2))
    params, opt_state = model.init(0)
    targets = jnp.arange(csr.num_nodes, dtype=jnp.int32)
    first = last = None
    for epoch in range(30):
        walks = trw.walk(csr, target_nodes=targets, walk_length=10,
                         seed=epoch)
        tgt, pos, neg = to_windows(walks, 5, csr.num_nodes, seed=epoch)
        params, opt_state, loss = model.train_step(params, opt_state, tgt,
                                                   pos, neg)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"


def test_cbow_loss_decreases():
    csr = barbell_graph()
    model = CBOWModel(csr.num_nodes, dim=16)
    params, opt_state = model.init(0)
    targets = jnp.arange(csr.num_nodes, dtype=jnp.int32)
    first = last = None
    for epoch in range(30):
        walks = trw.walk(csr, target_nodes=targets, walk_length=10,
                         seed=epoch)
        pos_n, neg_n, ctx = to_windows_cbow(walks, 5, csr.num_nodes,
                                            seed=epoch)
        params, opt_state, loss = model.train_step(params, opt_state, pos_n,
                                                   neg_n, ctx)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first


def test_node2vec_pipeline_learns_communities():
    csr = barbell_graph()
    cfg = Node2VecConfig(dim=16, walk_length=10, window_size=5,
                         learning_rate=5e-2, seed=0)
    n2v = Node2Vec(csr, cfg)
    params, losses = n2v.train(num_epochs=60)
    assert losses[-1] < losses[0]
    emb = np.asarray(n2v.embeddings(params))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = emb @ emb.T
    a, b = list(range(5)), list(range(5, 10))
    intra = (sim[np.ix_(a, a)].sum() - 5) / 20 / 2 + (
        sim[np.ix_(b, b)].sum() - 5
    ) / 20 / 2
    inter = sim[np.ix_(a, b)].mean()
    assert intra > inter + 0.1, f"communities not separated: {intra} vs {inter}"


def test_walk_loss_matches_windows_loss_on_positives():
    """walk_loss_fn (blockwise) covers the IDENTICAL (target, context)
    pairs as to_windows + loss_fn: with the negative term neutralized on
    both sides, the losses are equal.  Windows-side negatives all point at
    a zeroed out_emb row, contributing exactly (W-1)*log(2) per window."""
    import jax

    csr = barbell_graph()
    n, d, w = csr.num_nodes, 8, 5
    k = jax.random.key(3)
    params = {
        "in_emb": jax.random.normal(jax.random.fold_in(k, 0), (n, d)),
        "out_emb": jax.random.normal(jax.random.fold_in(k, 1), (n, d))
        .at[0].set(0.0),
    }
    walks = trw.walk(csr, target_nodes=jnp.arange(n, dtype=jnp.int32),
                     walk_length=10, seed=4)
    tgt, pos, _ = to_windows(walks, w, n, seed=4)
    neg = jnp.zeros_like(pos)  # all hit the zeroed row: logit 0
    win_loss = float(SkipGramModel.loss_fn(params, tgt, pos, neg))
    blk_loss = float(SkipGramModel.walk_loss_fn(
        params, walks, jnp.zeros((1,), jnp.int32), w, num_neg=0))
    np.testing.assert_allclose(win_loss - (w - 1) * np.log(2.0), blk_loss,
                               rtol=1e-5)


def test_windows_train_mode_learns_communities():
    """The reference-shaped pipeline (materialized windows, per-window
    negatives) stays available and still learns after 'block' became the
    default."""
    csr = barbell_graph()
    cfg = Node2VecConfig(dim=16, walk_length=10, window_size=5,
                         learning_rate=5e-2, seed=0, train_mode="windows")
    n2v = Node2Vec(csr, cfg)
    params, losses = n2v.train(num_epochs=40)
    assert losses[-1] < losses[0]


def test_biased_pipeline_runs():
    csr = barbell_graph()
    cfg = Node2VecConfig(dim=8, walk_length=8, window_size=3, p=0.5, q=2.0,
                         seed=1)
    n2v = Node2Vec(csr, cfg)
    params, losses = n2v.train(num_epochs=3)
    assert np.isfinite(losses).all()


def test_skipgram_bf16_tables_learn():
    """bf16 embedding tables (half the gather/scatter bandwidth) still learn;
    logits/loss stay float32."""
    import optax

    csr = barbell_graph()
    model = SkipGramModel(csr.num_nodes, dim=16,
                          optimizer=optax.adam(5e-2), dtype=jnp.bfloat16)
    params, opt_state = model.init(0)
    assert params["in_emb"].dtype == jnp.bfloat16
    targets = jnp.arange(csr.num_nodes, dtype=jnp.int32)
    first = last = None
    for epoch in range(25):
        walks = trw.walk(csr, target_nodes=targets, walk_length=10,
                         seed=epoch)
        tgt, pos, neg = to_windows(walks, 5, csr.num_nodes, seed=epoch)
        params, opt_state, loss = model.train_step(params, opt_state, tgt,
                                                   pos, neg)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.9, f"bf16 loss did not decrease: {first} -> {last}"


class TestSparseAdam:
    """Touched-rows (lazy) Adam step (SkipGramModel.walk_train_step_sparse)."""

    def _model(self, n, lr=5e-2, dtype=jnp.float32):
        import optax

        return SkipGramModel(n, dim=8, optimizer=optax.adam(lr),
                             dtype=dtype, learning_rate=lr)

    def test_matches_dense_when_all_rows_touched(self):
        """When every node appears among the centers AND walks+negatives
        every step, lazy == dense Adam: params/loss track optax.adam."""
        n = 8
        model = self._model(n)
        p_d, o_d = model.init(0)
        p_s, _ = model.init(0)
        o_s = model.init_sparse_opt_state(p_s)
        rng = np.random.default_rng(0)
        for step in range(5):
            base = rng.integers(0, n, (16, 7)).astype(np.int32)
            # Window 3 -> centers are columns 1..5: plant all ids there.
            base[:n, 2] = np.arange(n)
            walks = jnp.asarray(base)
            neg = jnp.asarray(np.arange(n, dtype=np.int32))
            p_d, o_d, l_d = model.walk_train_step(p_d, o_d, walks, neg, 3, 2)
            p_s, o_s, l_s = model.walk_train_step_sparse(p_s, o_s, walks,
                                                         neg, 3, 2)
            np.testing.assert_allclose(float(l_d), float(l_s), rtol=1e-6)
        for k in ("in_emb", "out_emb"):
            np.testing.assert_allclose(np.asarray(p_d[k]), np.asarray(p_s[k]),
                                       rtol=2e-5, atol=1e-7)

    def test_untouched_rows_unchanged(self):
        """Rows absent from the batch keep their params AND moments bitwise
        (the lazy semantics; dense Adam would keep decaying them)."""
        n = 32
        model = self._model(n)
        params, _ = model.init(0)
        opt_state = model.init_sparse_opt_state(params)
        walks = jnp.asarray(np.full((4, 7), 3, np.int32))
        neg = jnp.asarray([5, 6], np.int32)
        before_in = np.asarray(params["in_emb"])
        before_out = np.asarray(params["out_emb"])
        params, opt_state, _ = model.walk_train_step_sparse(
            params, opt_state, walks, neg, 3, 2)
        after_in = np.asarray(params["in_emb"])
        after_out = np.asarray(params["out_emb"])
        touched = np.zeros(n, bool)
        touched[[3, 5, 6]] = True  # walks visit 3; 5, 6 are negatives
        np.testing.assert_array_equal(after_out[~touched],
                                      before_out[~touched])
        np.testing.assert_array_equal(after_in[~touched],
                                      before_in[~touched])
        # out_emb[3] takes the positive-pair gradient (in_emb[3]'s own
        # gradient is zero on step one: out_emb initializes to zeros).
        assert not np.array_equal(after_out[3], before_out[3])
        assert np.asarray(opt_state["mu"]["out_emb"])[~touched].sum() == 0.0

    def test_node2vec_sparse_update_learns_and_checkpoints(self):
        """End-to-end: update_mode='sparse' trains through Node2Vec, the
        loss decreases, and the opt-state pytree round-trips through the
        checkpoint layer."""
        from torch_random_walk_tpu.utils import checkpoint

        csr = barbell_graph()
        cfg = Node2VecConfig(dim=8, walk_length=8, window_size=3,
                             learning_rate=5e-2, seed=1,
                             update_mode="sparse")
        n2v = Node2Vec(csr, cfg)
        params, losses = n2v.train(num_epochs=25)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9
        import tempfile

        params, opt_state = n2v.init()
        with tempfile.TemporaryDirectory() as d:
            checkpoint.save(d, {"params": params, "opt": opt_state}, 0)
            restored, step = checkpoint.restore(
                d, {"params": params, "opt": opt_state})
        assert step == 0
        np.testing.assert_array_equal(
            np.asarray(restored["opt"]["count"]),
            np.asarray(opt_state["count"]))

    def test_sparse_rejects_windows_mode(self):
        import pytest

        with pytest.raises(ValueError):
            Node2Vec(barbell_graph(),
                     Node2VecConfig(update_mode="sparse",
                                    train_mode="windows"))

    def test_sparse_rejects_ambiguous_custom_optimizer(self):
        """A custom optax optimizer is opaque; the sparse step must refuse
        to run with the model's default hyperparameters (they would
        silently diverge from the dense step's)."""
        import optax
        import pytest

        model = SkipGramModel(8, dim=4, optimizer=optax.adam(5e-2))
        params, _ = model.init(0)
        opt_state = model.init_sparse_opt_state(params)
        walks = jnp.zeros((2, 7), jnp.int32)
        neg = jnp.zeros((2,), jnp.int32)
        with pytest.raises(ValueError, match="learning_rate"):
            model.walk_train_step_sparse(params, opt_state, walks, neg, 3, 2)


class TestScatterRows:
    """scatter_rows == table.at[ids].set for sorted-unique OOB-padded ids,
    across the narrow-row (D < 128) grouped path and the plain path."""

    @pytest.mark.parametrize("n,d", [(64, 64), (64, 32), (65, 64), (40, 128),
                                     (64, 48)])
    def test_matches_plain_scatter(self, n, d):
        from torch_random_walk_tpu.models.skipgram import scatter_rows

        rng = np.random.default_rng(3 + n + d)
        table = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        for k in (1, 7, n // 2, n):
            ids_np = np.sort(rng.choice(n, size=k, replace=False))
            pad = np.full(5, n)
            ids = jnp.asarray(np.concatenate([ids_np, pad]), jnp.int32)
            rows = jnp.asarray(rng.normal(size=(k + 5, d)), jnp.float32)
            want = table.at[ids].set(rows, mode="drop",
                                     indices_are_sorted=True,
                                     unique_indices=True)
            got = scatter_rows(table, ids, rows)
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_adjacent_ids_same_group(self):
        """Both members of one group updated in the same call (the run-merge
        path) and a group where only one member is updated."""
        from torch_random_walk_tpu.models.skipgram import scatter_rows

        n, d = 8, 64  # g = 2
        table = jnp.zeros((n, d), jnp.float32)
        ids = jnp.asarray([2, 3, 6, n, n], jnp.int32)
        rows = jnp.stack([jnp.full((d,), v, jnp.float32)
                          for v in (1.0, 2.0, 3.0, 9.0, 9.0)])
        got = np.asarray(scatter_rows(table, ids, rows))
        assert (got[2] == 1.0).all() and (got[3] == 2.0).all()
        assert (got[6] == 3.0).all() and (got[7] == 0.0).all()
        assert (got[[0, 1, 4, 5]] == 0.0).all()
