"""Diagnostics for the two open QUALITY.md residuals (VERDICT r4 #5).

(a) **SBM link-pred residual** — cora-shape trained-readout AUC sits at
    ~0.61 against the repo's own SBM information ceiling of ~0.894.  The
    ceiling argument says 0.95 is impossible on the proxy; it does NOT say
    why the method sits 0.28 below the ceiling.  Two controlled arms split
    the blame:

      arm "engine":  the production pipeline (freerun mixture sampler →
                     blockwise SGNS), exactly the QUALITY.md row.
      arm "oracle":  the SAME trainer fed walks from an independent
                     NumPy inverse-CDF sampler of the exact node2vec law
                     (padded-row normalized weights — no rejection, no
                     Bloom, no cuckoo, shares no code with the engines).
                     If AUC matches the engine arm, sampling is exonerated
                     and the residual lives in SGNS training/geometry.
      arm "block-onehot": the trained Hadamard readout on one-hot BLOCK
                     embeddings (the best embedding an SBM admits).  If it
                     reaches the ceiling, the readout is exonerated.
      arm "pred-onehot": same readout on one-hot PREDICTED blocks (the
                     logistic block classifier the accuracy row uses) —
                     ties the 0.91 per-node accuracy to its pair-level
                     consequence.

(b) **Bipartite inversion** — davis-southern-women raw-cosine AUC ~0.30 is
    BELOW chance.  Measures the mechanism directly: mean cosine of
    same-side vs opposite-side pairs (skip-gram homophily makes same-side
    nodes most similar, but every true edge is opposite-side), the
    anti-cosine AUC (= 1 - cosine AUC: the ranking is inverted, not
    uninformative), and a minimal sign-free readout — a 1-feature logistic
    on the cosine score, trained on the training split — which learns the
    negative weight and recovers the signal without hand-flipping.

Run:  python benchmarks/quality_diagnostics.py [--epochs 150] [--json-out f]
Writes the measured numbers to stdout as a JSON line; QUALITY.md quotes
them in its notes section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def oracle_node2vec_walks(row_ptr, col_idx, targets, p, q, walk_length, rng):
    """Vectorized NumPy sampler of the exact node2vec law.

    Independent implementation for the sampling-vs-training blame split:
    normalized-weight inverse-CDF over padded neighbor rows (w = 1/p at
    x == t, 1 for x in N(t), 1/q otherwise — rw_cpu.cpp:129-134's
    acceptance weights, sampled directly instead of by rejection).  Dead
    ends stay in place, matching the engines.
    """
    row_ptr = np.asarray(row_ptr)
    col_idx = np.asarray(col_idx)
    n = row_ptr.shape[0] - 1
    deg = np.diff(row_ptr)
    max_deg = max(int(deg.max()), 1)
    # Padded neighbor matrix (duplicates preserved: multiplicity matters).
    nbr = np.zeros((n, max_deg), np.int64)
    valid = np.arange(max_deg)[None, :] < deg[:, None]
    nbr[valid] = col_idx
    adj = np.zeros((n, n), bool)
    heads = np.repeat(np.arange(n), deg)
    adj[heads, col_idx] = True

    B = targets.size
    walks = np.zeros((B, walk_length + 1), np.int64)
    walks[:, 0] = targets
    v = np.asarray(targets).copy()
    t = v.copy()
    for s in range(1, walk_length + 1):
        rows = nbr[v]                       # (B, max_deg)
        ok = valid[v]
        if s == 1:
            w = ok.astype(np.float64)
        else:
            w = np.where(rows == t[:, None], 1.0 / p,
                         np.where(adj[t[:, None], rows], 1.0, 1.0 / q))
            w = np.where(ok, w, 0.0)
        total = w.sum(axis=1)
        cum = np.cumsum(w, axis=1)
        u = rng.random(B) * total
        idx = (cum <= u[:, None]).sum(axis=1).clip(0, max_deg - 1)
        nxt = rows[np.arange(B), idx]
        alive = deg[v] > 0
        nxt = np.where(alive, nxt, v)       # dead end stays (t collapses
        t, v = v, nxt                       #  onto v, like the engines)
        walks[:, s] = v
    return walks


def train_from_walk_source(num_nodes, sample_walks, cfg_seed, epochs, dim,
                           walk_length, window_size, lr, shared_negatives):
    """Blockwise SGNS training loop fed by an arbitrary walk source —
    mirrors Node2Vec._train's block mode (same negative stream, same
    step) so the only difference between arms is where walks come from."""
    import jax.numpy as jnp
    import optax

    from torch_random_walk_tpu.models.skipgram import (
        SkipGramModel,
        shared_negative_ids,
    )

    model = SkipGramModel(num_nodes, dim, optimizer=optax.adam(lr),
                          learning_rate=lr)
    params, opt_state = model.init(cfg_seed)
    loss = None
    for epoch in range(epochs):
        seed = (cfg_seed + epoch * 0x9E3779B1) & 0xFFFFFFFF
        walks = jnp.asarray(sample_walks(epoch), jnp.int32)
        neg_ids = shared_negative_ids(jnp.uint32(seed), shared_negatives,
                                      num_nodes)
        params, opt_state, loss = model.walk_train_step(
            params, opt_state, walks, neg_ids, window_size,
            window_size - 1)
    emb = np.asarray(model.embeddings(params), np.float32)
    return emb, float(loss)


def run_sbm_blame_split(seed=0, epochs=150, name="cora"):
    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.graph.datasets import synthetic_sbm
    from torch_random_walk_tpu.models import (
        Node2Vec,
        Node2VecConfig,
        link_prediction_auc_trained,
        sample_negative_edges,
        sbm_oracle_auc,
    )
    from quality_run import holdout_edges

    n = 2708 if name == "cora" else 3327
    graph_full, labels, edges = synthetic_sbm(
        n, 7 if name == "cora" else 6, 3.9, seed=seed)
    train_e, test_e = holdout_edges(edges, 0.1, seed)
    src = np.concatenate([train_e[:, 0], train_e[:, 1]])
    dst = np.concatenate([train_e[:, 1], train_e[:, 0]])
    train_graph = CSRGraph.from_edges(src, dst, num_nodes=n)
    neg_e = sample_negative_edges(n, edges, len(test_e), seed=seed + 1)
    ceiling = float(sbm_oracle_auc(labels, test_e, neg_e))
    out = {"dataset": f"{name}-shape-sbm", "epochs": epochs,
           "sbm_ceiling_auc": round(ceiling, 4)}

    # -- arm "engine": the production pipeline (QUALITY.md row config) ----
    cfg = Node2VecConfig(dim=128, walk_length=40, window_size=5,
                         walks_per_node=8, p=0.5, q=2.0,
                         learning_rate=2.5e-2, seed=seed)
    t0 = time.time()
    n2v = Node2Vec(train_graph, cfg)
    params, _ = n2v.train(num_epochs=epochs)
    emb_e = np.asarray(n2v.embeddings(params), np.float32)
    out["engine_auc_trained"] = round(float(link_prediction_auc_trained(
        emb_e, train_e, test_e, neg_e, n, seed=seed)), 4)
    out["engine_sec"] = round(time.time() - t0, 1)

    # -- arm "oracle": identical trainer, independent exact-law sampler ---
    rp = np.asarray(train_graph.row_ptr)
    ci = np.asarray(train_graph.col_idx)
    targets = np.tile(np.arange(n), cfg.walks_per_node)

    def sample(epoch):
        rng = np.random.default_rng((seed + 1) * 1_000_003 + epoch)
        return oracle_node2vec_walks(rp, ci, targets, cfg.p, cfg.q,
                                     cfg.walk_length, rng)

    t0 = time.time()
    emb_o, _ = train_from_walk_source(
        n, sample, seed, epochs, cfg.dim, cfg.walk_length, cfg.window_size,
        cfg.learning_rate, cfg.shared_negatives)
    out["oracle_auc_trained"] = round(float(link_prediction_auc_trained(
        emb_o, train_e, test_e, neg_e, n, seed=seed)), 4)
    out["oracle_sec"] = round(time.time() - t0, 1)

    # -- arm "block-onehot": ceiling-attaining embedding, same readout ----
    onehot = np.eye(int(labels.max()) + 1, dtype=np.float32)[labels]
    out["block_onehot_auc_trained"] = round(float(
        link_prediction_auc_trained(onehot, train_e, test_e, neg_e, n,
                                    seed=seed)), 4)

    # -- arm "pred-onehot": predicted blocks (pair-level view of the 0.91
    #    node accuracy) — logistic block classifier on the ENGINE embedding
    #    with the accuracy row's own 50% label split.
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = n // 2
    clf = LogisticRegression(max_iter=1000)
    clf.fit(emb_e[perm[:k]], labels[perm[:k]])
    pred = clf.predict(emb_e)
    out["node_acc_on_split"] = round(
        float((pred[perm[k:]] == labels[perm[k:]]).mean()), 4)
    pred_onehot = np.eye(int(labels.max()) + 1, dtype=np.float32)[pred]
    out["pred_onehot_auc_trained"] = round(float(
        link_prediction_auc_trained(pred_onehot, train_e, test_e, neg_e, n,
                                    seed=seed)), 4)
    return out


def run_bipartite_mechanism(seed=0, epochs=150, n_splits=3):
    import networkx as nx

    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.models import (
        Node2Vec,
        Node2VecConfig,
        link_prediction_auc,
        sample_negative_edges,
    )
    from quality_run import holdout_edges

    g = nx.davis_southern_women_graph()
    nodes = list(g.nodes)
    idx = {nm: i for i, nm in enumerate(nodes)}
    side = np.asarray([g.nodes[nm]["bipartite"] for nm in nodes])
    edges = np.asarray([(idx[u], idx[v]) for u, v in g.edges])
    n = len(nodes)

    res = {"dataset": "davis-southern-women", "epochs": epochs,
           "n_splits": n_splits}
    same_cos, cross_cos, cos_auc, anti_auc, fixed_auc = [], [], [], [], []
    for split in range(n_splits):
        train_e, test_e = holdout_edges(edges, 0.1, seed + split)
        src = np.concatenate([train_e[:, 0], train_e[:, 1]])
        dst = np.concatenate([train_e[:, 1], train_e[:, 0]])
        graph = CSRGraph.from_edges(src, dst, num_nodes=n)
        cfg = Node2VecConfig(dim=32, walk_length=20, window_size=5,
                             walks_per_node=16, p=0.5, q=2.0,
                             learning_rate=2.5e-2, seed=seed + split)
        n2v = Node2Vec(graph, cfg)
        params, _ = n2v.train(num_epochs=epochs)
        emb = np.asarray(n2v.embeddings(params), np.float32)
        emb_n = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        cos = emb_n @ emb_n.T
        iu, ju = np.triu_indices(n, 1)
        same = side[iu] == side[ju]
        same_cos.append(float(cos[iu[same], ju[same]].mean()))
        cross_cos.append(float(cos[iu[~same], ju[~same]].mean()))
        neg_e = sample_negative_edges(n, edges, len(test_e),
                                      seed=seed + split + 1)
        a = float(link_prediction_auc(emb, test_e, neg_e, score="cosine"))
        cos_auc.append(a)
        anti_auc.append(1.0 - a)  # AUC of the NEGATED score, by identity
        # Minimal sign-free readout: 1-feature logistic on the cosine,
        # trained on the training split (positives vs fresh negatives) —
        # learns the negative weight instead of assuming homophily.
        from sklearn.linear_model import LogisticRegression

        tr_neg = sample_negative_edges(n, edges, len(train_e),
                                       seed=seed + split + 7)
        f_tr = np.concatenate([cos[train_e[:, 0], train_e[:, 1]],
                               cos[tr_neg[:, 0], tr_neg[:, 1]]])[:, None]
        y_tr = np.concatenate([np.ones(len(train_e)),
                               np.zeros(len(tr_neg))])
        clf = LogisticRegression().fit(f_tr, y_tr)
        f_te = np.concatenate([cos[test_e[:, 0], test_e[:, 1]],
                               cos[neg_e[:, 0], neg_e[:, 1]]])[:, None]
        s_te = clf.decision_function(f_te)
        y_te = np.concatenate([np.ones(len(test_e)), np.zeros(len(neg_e))])
        order = np.argsort(s_te)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(len(s_te))
        pos_r = ranks[y_te == 1]
        auc_f = ((pos_r.sum() - len(pos_r) * (len(pos_r) - 1) / 2)
                 / (len(pos_r) * (len(s_te) - len(pos_r))))
        fixed_auc.append(float(auc_f))
        res["cosine_sign_weight"] = round(float(clf.coef_[0, 0]), 3)
    res.update(
        mean_cos_same_side=round(float(np.mean(same_cos)), 4),
        mean_cos_opposite_side=round(float(np.mean(cross_cos)), 4),
        cosine_auc=round(float(np.mean(cos_auc)), 4),
        anti_cosine_auc=round(float(np.mean(anti_auc)), 4),
        signfree_readout_auc=round(float(np.mean(fixed_auc)), 4),
    )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--which", choices=["sbm", "bipartite", "all"],
                    default="all")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    out = {}
    if args.which in ("sbm", "all"):
        out["sbm_blame_split"] = run_sbm_blame_split(args.seed, args.epochs)
        print(json.dumps(out["sbm_blame_split"]), flush=True)
    if args.which in ("bipartite", "all"):
        out["bipartite_mechanism"] = run_bipartite_mechanism(
            args.seed, args.epochs)
        print(json.dumps(out["bipartite_mechanism"]), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
