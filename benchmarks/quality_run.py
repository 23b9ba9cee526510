"""Downstream embedding-quality runs (BASELINE.json configs 2 and 4).

Trains node2vec end-to-end (walks -> windows -> SGNS) and records link
prediction AUC on held-out edges plus node-classification accuracy, writing
the results to QUALITY.md.  Uses real Cora/Citeseer/ogbn-products data when
present under --data-root (graph/datasets loaders); in download-free
environments it substitutes matched-shape benchmarks with ground truth:

- "cora-shape": a 2708-node / 7-block SBM at Cora's average degree — the
  communities play the role of Cora's classes.
- "products-shape": the ogbn-products-sized power-law graph (2.45M nodes,
  ~124M edges) with held-out-edge link prediction (no labels).

Run: python benchmarks/quality_run.py [--tier small|products|all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def holdout_edges(edges: np.ndarray, frac: float, seed: int):
    rng = np.random.default_rng(seed)
    k = int(frac * edges.shape[0])
    perm = rng.permutation(edges.shape[0])
    return edges[perm[k:]], edges[perm[:k]]  # train, test


def run_small(name: str, data_root: str, seed: int = 0,
              update_mode: str = "dense"):
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.graph.datasets import (
        load_planetoid,
        synthetic_sbm,
    )
    from torch_random_walk_tpu.models import (
        Node2Vec,
        Node2VecConfig,
        link_prediction_auc,
        link_prediction_auc_trained,
        node_classification_accuracy,
        sample_negative_edges,
        sbm_oracle_auc,
    )

    labels = None
    try:
        graph, labels = load_planetoid(name, root=data_root)
        rp = np.asarray(graph.row_ptr)
        ci = np.asarray(graph.col_idx)
        heads = np.repeat(np.arange(graph.num_nodes), np.diff(rp))
        und = heads < ci
        edges = np.stack([heads[und], ci[und]], axis=1)
        dataset = name
    except FileNotFoundError:
        n = 2708 if name == "cora" else 3327
        graph_full, labels, edges = synthetic_sbm(
            n, 7 if name == "cora" else 6, 3.9, seed=seed)
        dataset = f"{name}-shape-sbm"
        graph = graph_full

    # Hold out 10% of undirected edges for link prediction; train on the rest.
    train_e, test_e = holdout_edges(edges, 0.1, seed)
    src = np.concatenate([train_e[:, 0], train_e[:, 1]])
    dst = np.concatenate([train_e[:, 1], train_e[:, 0]])
    train_graph = CSRGraph.from_edges(src, dst, num_nodes=graph.num_nodes)

    # BASELINE.json config 2: node2vec p=0.5, q=2.0.
    cfg = Node2VecConfig(dim=128, walk_length=40, window_size=5,
                         walks_per_node=8, p=0.5, q=2.0,
                         learning_rate=2.5e-2, seed=seed,
                         update_mode=update_mode)
    n2v = Node2Vec(train_graph, cfg)
    t0 = time.time()
    params, losses = n2v.train(num_epochs=150)
    emb = np.asarray(n2v.embeddings(params), np.float32)
    train_sec = time.time() - t0

    neg_e = sample_negative_edges(graph.num_nodes, edges, len(test_e),
                                  seed=seed + 1)
    auc = link_prediction_auc(emb, test_e, neg_e, score="cosine")
    # The node2vec paper's actual protocol: Hadamard features + a TRAINED
    # edge classifier (the published 0.85-0.95 Cora band is measured this
    # way; raw cosine systematically undershoots it).
    auc_tr = link_prediction_auc_trained(emb, train_e, test_e, neg_e,
                                         graph.num_nodes, seed=seed)
    oracle = None
    if dataset.endswith("sbm"):
        # Information ceiling of the SBM proxy: within-block edges are iid,
        # so no method can beat same-block-indicator scoring on this split.
        oracle = sbm_oracle_auc(labels, test_e, neg_e)
    acc = None
    if labels is not None:
        mask = labels >= 0
        acc = node_classification_accuracy(emb[mask], labels[mask],
                                           train_frac=0.5, seed=seed)
    return {
        "dataset": dataset,
        "nodes": graph.num_nodes,
        "edges": graph.num_edges,
        "config": ("node2vec p=0.5 q=2.0 dim=128 L=40 W=5 x8walks 150ep "
                   f"{cfg.train_mode}"
                   + (f" S={cfg.shared_negatives}"
                      if cfg.train_mode == "block" else "")
                   + (" sparse-adam"
                      if cfg.update_mode == "sparse" else "")),
        "link_pred_auc_trained": round(float(auc_tr), 4),
        "sbm_oracle_auc": (round(float(oracle), 4)
                           if oracle is not None else None),
        "link_pred_auc": round(float(auc), 4),
        "classification_acc": (round(float(acc), 4)
                               if acc is not None else None),
        "final_loss": round(float(losses[-1]), 4),
        "train_sec": round(train_sec, 1),
    }


def run_products(data_root: str, seed: int = 0, epochs: int = 3,
                 batch: int = 65_536, update_mode: str = "dense"):
    import jax
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.graph.datasets import (
        load_ogbn,
        products_shape_graph,
    )
    from torch_random_walk_tpu.models import (
        Node2Vec,
        Node2VecConfig,
        link_prediction_auc,
        sample_negative_edges,
    )

    try:
        graph, _ = load_ogbn("ogbn-products", root=data_root)
        dataset = "ogbn-products"
    except ImportError:
        graph = products_shape_graph(data_root)
        dataset = "products-shape-synthetic"

    # Held-out link prediction: sample test edges from the CSR itself.
    rng = np.random.default_rng(seed)
    rp = np.asarray(graph.row_ptr)
    ci = np.asarray(graph.col_idx)
    heads = np.repeat(np.arange(graph.num_nodes), np.diff(rp))
    pick = rng.choice(heads.shape[0], 20_000, replace=False)
    test_e = np.stack([heads[pick], ci[pick]], axis=1)

    cfg = Node2VecConfig(dim=128, walk_length=20, window_size=5,
                         p=1.0, q=1.0, learning_rate=5e-3, seed=seed,
                         dtype="bfloat16", update_mode=update_mode)
    n2v = Node2Vec(graph, cfg)
    params, opt_state = n2v.init()
    t0 = time.time()
    steps = 0
    for epoch in range(epochs):
        for off in range(0, graph.num_nodes, batch):
            tgt = (np.arange(batch, dtype=np.int32) + off) % graph.num_nodes
            params, opt_state, loss = n2v.epoch_step(
                params, opt_state, jnp.asarray(tgt),
                jnp.uint32(epoch * 1000 + off // batch))
            steps += 1
    jax.block_until_ready(loss)
    train_sec = time.time() - t0
    emb = np.asarray(n2v.embeddings(params), np.float32)

    neg_e = sample_negative_edges(graph.num_nodes, test_e[:0], len(test_e),
                                  seed=seed + 1)
    auc = link_prediction_auc(emb, test_e, neg_e, score="dot")
    return {
        "dataset": dataset,
        "nodes": graph.num_nodes,
        "edges": graph.num_edges,
        "config": (f"deepwalk dim=128 L=20 W=5 {epochs}ep batch={batch} "
                   f"bf16 table {cfg.train_mode}"
                   + (f" S={cfg.shared_negatives}"
                      if cfg.train_mode == "block" else "")
                   + (" sparse-adam"
                      if cfg.update_mode == "sparse" else "")),
        "link_pred_auc": round(float(auc), 4),
        "final_loss": round(float(loss), 4),
        "train_sec": round(train_sec, 1),
        "fused_steps": steps,
    }


def run_real_small(seed: int = 0, update_mode: str = "dense"):
    """REAL-graph quality runs on the classic datasets networkx bundles
    (available offline even in the zero-egress build environment):

    - Zachary's karate club (34 nodes, 78 edges, real faction labels) —
      node classification of the Mr. Hi / Officer split, the original
      DeepWalk demo task (DeepWalk paper fig. 1 uses exactly this graph);
    - Les Misérables character co-occurrence (77 nodes, 254 edges) —
      held-out-edge link prediction (raw cosine + trained Hadamard
      readout, the node2vec paper's protocol);
    - Davis southern women (32 nodes, 89 bipartite attendance edges) —
      held-out-edge link prediction on a second real network.
    """
    import networkx as nx
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.models import (
        Node2Vec,
        Node2VecConfig,
        link_prediction_auc,
        link_prediction_auc_trained,
        node_classification_accuracy,
        sample_negative_edges,
    )

    results = []

    # -- karate: classification ------------------------------------------
    g = nx.karate_club_graph()
    labels = np.asarray(
        [0 if g.nodes[i]["club"] == "Mr. Hi" else 1 for i in g.nodes])
    graph = CSRGraph.from_networkx(g)
    cfg = Node2VecConfig(dim=32, walk_length=20, window_size=5,
                         walks_per_node=16, p=0.5, q=2.0,
                         learning_rate=2.5e-2, seed=seed,
                         update_mode=update_mode)
    n2v = Node2Vec(graph, cfg)
    t0 = time.time()
    params, losses = n2v.train(num_epochs=150)
    emb = np.asarray(n2v.embeddings(params), np.float32)
    acc = node_classification_accuracy(emb, labels, train_frac=0.5,
                                       seed=seed)
    results.append({
        "dataset": "karate-club (REAL)",
        "nodes": graph.num_nodes, "edges": graph.num_edges,
        "config": "node2vec p=0.5 q=2.0 dim=32 L=20 W=5 x16walks 150ep",
        "link_pred_auc": None,
        "classification_acc": round(float(acc), 4),
        "final_loss": round(float(losses[-1]), 4),
        "train_sec": round(time.time() - t0, 1),
    })

    # -- link prediction on every real network networkx bundles ----------
    # (VERDICT r3 #7: >2 real points for the trained-readout protocol.)
    # Tiny graphs make single 10%-holdout AUCs coarse (a handful of test
    # edges), so each dataset averages ``n_splits`` independent holdout
    # splits; florentine-families holds out 20% (10% of 20 edges = 2).
    link_sets = (
        ("les-miserables", nx.les_miserables_graph(), 0.1, 3),
        ("davis-southern-women", nx.davis_southern_women_graph(), 0.1, 3),
        ("florentine-families", nx.florentine_families_graph(), 0.2, 5),
    )
    for gname, g, frac, n_splits in link_sets:
        nodes = list(g.nodes)
        idx = {n: i for i, n in enumerate(nodes)}
        edges = np.asarray([(idx[u], idx[v]) for u, v in g.edges])
        aucs, aucs_tr, losses_f = [], [], []
        t0 = time.time()
        for split in range(n_splits):
            train_e, test_e = holdout_edges(edges, frac, seed + split)
            src = np.concatenate([train_e[:, 0], train_e[:, 1]])
            dst = np.concatenate([train_e[:, 1], train_e[:, 0]])
            graph = CSRGraph.from_edges(src, dst, num_nodes=len(nodes))
            cfg = Node2VecConfig(dim=32, walk_length=20, window_size=5,
                                 walks_per_node=16, p=0.5, q=2.0,
                                 learning_rate=2.5e-2, seed=seed + split,
                                 update_mode=update_mode)
            n2v = Node2Vec(graph, cfg)
            params, losses = n2v.train(num_epochs=150)
            emb = np.asarray(n2v.embeddings(params), np.float32)
            neg_e = sample_negative_edges(len(nodes), edges, len(test_e),
                                          seed=seed + split + 1)
            aucs.append(link_prediction_auc(emb, test_e, neg_e,
                                            score="cosine"))
            aucs_tr.append(link_prediction_auc_trained(
                emb, train_e, test_e, neg_e, len(nodes), seed=seed + split))
            losses_f.append(float(losses[-1]))
        results.append({
            "dataset": f"{gname} (REAL)",
            "nodes": len(nodes), "edges": len(edges) * 2,
            "config": ("node2vec p=0.5 q=2.0 dim=32 L=20 W=5 x16walks "
                       f"150ep ({int(frac * 100)}% held out, "
                       f"mean of {n_splits} splits)"),
            "link_pred_auc": round(float(np.mean(aucs)), 4),
            "link_pred_auc_trained": round(float(np.mean(aucs_tr)), 4),
            "link_pred_auc_std": round(float(np.std(aucs)), 4),
            "classification_acc": None,
            "final_loss": round(float(np.mean(losses_f)), 4),
            "train_sec": round(time.time() - t0, 1),
        })
    return results


def run_kg(seed: int = 0, side: int = 45, epochs: int = 1000,
           objective: str = "transe", update_mode: str = "dense"):
    """KG-embedding quality on the grid-world KG (exact TransE ground
    truth, filtered tail-ranking protocol — the KG analog of the node
    tiers' held-out link prediction).  Defaults from a measured sweep:
    lr=0.1/margin=2/1000ep reaches MRR 0.994 (hits@1 0.99) for TransE;
    300ep plateaus at 0.18 and margin=4 degrades to 0.62."""
    from torch_random_walk_tpu.graph.datasets import synthetic_grid_kg
    from torch_random_walk_tpu.models import (
        KGEmbedding,
        KGEmbeddingConfig,
        kg_tail_ranking_metrics,
    )

    graph, all_triples, test = synthetic_grid_kg(side, seed=seed)
    cfg = KGEmbeddingConfig(dim=64, walk_length=20, objective=objective,
                            num_negatives=8, learning_rate=1e-1, seed=seed,
                            update_mode=update_mode)
    tr = KGEmbedding(graph, cfg)
    t0 = time.time()
    params, losses = tr.train(epochs)
    train_sec = time.time() - t0
    m = kg_tail_ranking_metrics(
        np.asarray(tr.model.entity_embeddings(params), np.float32),
        np.asarray(tr.model.relation_embeddings(params), np.float32),
        test, score=objective, filter_triples=all_triples)
    return {
        "dataset": f"grid-kg {side}x{side}",
        "entities": graph.num_entities,
        "triples": int(all_triples.shape[0]),
        "config": (f"{objective} dim=64 L=20 K=8 {epochs}ep "
                   + ("sparse-adam " if update_mode == "sparse" else "")
                   + "(10% held out, filtered ranking; random MRR ~"
                   f"{round(float(np.log(graph.num_entities)) / graph.num_entities, 4)})"),
        "mrr": round(m["mrr"], 4),
        "hits@1": round(m["hits@1"], 4),
        "hits@10": round(m["hits@10"], 4),
        "final_loss": round(float(losses[-1]), 4),
        "train_sec": round(train_sec, 1),
    }


HEADER = """# QUALITY — downstream embedding parity runs

The reference produces sampling batches for an external embedding trainer
(/root/reference/tests/test_windows.py:4-31 ends where training begins);
quality parity therefore means: our fused walk->windows->SGNS trainer must
produce embeddings that perform on downstream tasks the way node2vec
embeddings are known to.  Published context figures for real Cora:
node2vec/DeepWalk-class methods reach ~0.85-0.95 link-pred AUC and
~0.75-0.84 classification accuracy (Grover & Leskovec 2016, table 2-class
results vary by split).  In this build environment the real datasets are
not downloadable (zero egress); `graph/datasets.load_planetoid` /
`load_ogbn` consume them when present, and these runs substitute
matched-shape benchmarks with exact ground truth, which bound the same
failure modes (walk law, window geometry, optimizer, negative sampling).

Regenerate: `python benchmarks/quality_run.py --tier all`
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="small",
                    choices=["small", "real-small", "products", "kg", "all"])
    ap.add_argument("--data-root", default="dataset")
    ap.add_argument("--out", default="QUALITY.md")
    ap.add_argument("--epochs", type=int, default=3,
                    help="products-tier epochs (train is ~11s/epoch on v5e;"
                         " the default is a smoke run)")
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--update-mode", default="dense",
                    choices=["dense", "sparse"],
                    help="optimizer ablation (small + products tiers): "
                         "touched-rows lazy Adam vs dense optax.adam")
    args = ap.parse_args()

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    results = []
    if args.tier in ("small", "all"):
        for name in ("cora", "citeseer"):
            r = run_small(name, args.data_root,
                          update_mode=args.update_mode)
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.tier in ("real-small", "all"):
        for r in run_real_small(update_mode=args.update_mode):
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.tier in ("products", "all"):
        r = run_products(args.data_root, epochs=args.epochs,
                         batch=args.batch, update_mode=args.update_mode)
        print(json.dumps(r), flush=True)
        results.append(r)
    kg_results = []
    if args.tier in ("kg", "all"):
        for objective in ("transe", "rotate", "distmult"):
            r = run_kg(objective=objective, update_mode=args.update_mode)
            print(json.dumps(r), flush=True)
            kg_results.append(r)

    def auc_cell(r):
        cell = f"{r['link_pred_auc']}"
        if r.get("link_pred_auc_trained") is not None:
            cell += f" (trained readout {r['link_pred_auc_trained']}"
            if r.get("sbm_oracle_auc") is not None:
                cell += f", SBM ceiling {r['sbm_oracle_auc']}"
            cell += ")"
        return cell

    node_rows = [
        f"| {r['dataset']} | {r['nodes']} | {r['edges']} | {r['config']} "
        f"| {auc_cell(r)} | {r.get('classification_acc')} "
        f"| {r['final_loss']} | {r['train_sec']} |" for r in results]
    kg_rows = [
        f"| {r['dataset']} | {r['entities']} | {r['triples']} "
        f"| {r['config']} | {r['mrr']} | {r['hits@1']} "
        f"| {r['hits@10']} | {r['final_loss']} | {r['train_sec']} |"
        for r in kg_results]
    text = open(args.out).read() if os.path.exists(args.out) else (
        HEADER
        + "\n| dataset | nodes | edges | config | link-pred AUC | "
          "class. acc | loss | train s |\n|---|---|---|---|---|---|---|---|\n"
        + "\n## KG link prediction (tail ranking over triples walks -> "
          "models/kge.py)\n\n"
          "| dataset | entities | triples | config | filtered MRR | "
          "hits@1 | hits@10 | loss | train s |\n"
          "|---|---|---|---|---|---|---|---|---|\n")
    # Insert new rows at the top of their table; everything else in the
    # file (notes, older rows) is left untouched — measured ablation
    # records must survive partial regenerations.
    for marker, rows in (("link-pred AUC", node_rows),
                         ("filtered MRR", kg_rows)):
        if not rows:
            continue
        lines = text.splitlines()
        for i, line in enumerate(lines[1:], start=1):
            if line.startswith("|--") and marker in lines[i - 1]:
                lines[i + 1:i + 1] = rows
                break
        else:
            raise SystemExit(f"{args.out}: no table with '{marker}' column "
                             "— restore the table header or delete the file")
        text = "\n".join(lines) + ("\n" if not lines[-1] == "" else "")
    with open(args.out, "w") as f:
        f.write(text if text.endswith("\n") else text + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
