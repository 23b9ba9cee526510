"""Command-line entry points: sampling, training, benchmarking.

The library API stays pure functions with explicit arguments (matching the
reference's design); configuration-as-flags lives only here (SURVEY.md §5
config plan).  Graphs load from .npz edge files (arrays ``src``/``dst``) or
synthetic generators.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _load_graph(spec: str):
    """'path.npz' | 'synth:<nodes>:<avg_degree>[:seed]'"""
    from torch_random_walk_tpu.graph.csr import CSRGraph

    if spec.startswith("synth:"):
        parts = spec.split(":")
        n, deg = int(parts[1]), int(parts[2])
        seed = int(parts[3]) if len(parts) > 3 else 0
        rng = np.random.default_rng(seed)
        e = n * deg
        src = np.concatenate([np.arange(n), rng.integers(0, n, e)])
        dst = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, e)])
        return CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)
    with np.load(spec) as data:
        return CSRGraph.from_edges(data["src"], data["dst"])


def walk_main(argv=None):
    """Sample walks and save them to .npy."""
    ap = argparse.ArgumentParser(prog="trw-walk")
    ap.add_argument("graph", help=".npz with src/dst arrays, or synth:N:deg")
    ap.add_argument("-o", "--out", default="walks.npy")
    ap.add_argument("--walkers", type=int, default=0, help="0 = one per node")
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("-p", type=float, default=1.0)
    ap.add_argument("-q", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax.numpy as jnp
    from torch_random_walk_tpu.ops.walk import walk
    from torch_random_walk_tpu.utils.logging import get_logger

    log = get_logger("trw-walk")
    g = _load_graph(args.graph)
    b = args.walkers or g.num_nodes
    targets = jnp.arange(b, dtype=jnp.int32) % g.num_nodes
    t0 = time.perf_counter()
    walks = walk(g, target_nodes=targets, p=args.p, q=args.q,
                 walk_length=args.walk_length, seed=args.seed)
    out = np.asarray(walks)
    dt = time.perf_counter() - t0
    np.save(args.out, out)
    log.info("sampled %s walks of length %d in %.2fs (%.1fM node-steps/s) "
             "-> %s", out.shape[0], args.walk_length, dt,
             out.shape[0] * args.walk_length / dt / 1e6, args.out)


def train_main(argv=None):
    """Train node2vec embeddings end-to-end; save embeddings to .npy."""
    ap = argparse.ArgumentParser(prog="trw-train")
    ap.add_argument("graph", help=".npz with src/dst arrays, or synth:N:deg")
    ap.add_argument("-o", "--out", default="embeddings.npy")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--walk-length", type=int, default=40)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("-p", type=float, default=1.0)
    ap.add_argument("-q", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--checkpoint-every", type=int, default=25)
    ap.add_argument("--heartbeat", default="",
                    help="liveness file for an external watchdog")
    ap.add_argument("--max-retries", type=int, default=0,
                    help="restore-and-replay retries on device faults")
    ap.add_argument("--metrics", default="", help="JSONL metrics path")
    ap.add_argument("--update-mode", default="dense",
                    choices=["dense", "sparse"],
                    help="sparse = touched-rows lazy Adam (optimizer "
                         "traffic scales with the batch, not the vocab)")
    args = ap.parse_args(argv)

    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
    from torch_random_walk_tpu.utils.elastic import (
        ElasticConfig,
        run_resumable,
    )
    from torch_random_walk_tpu.utils.logging import MetricsWriter, get_logger
    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()
    log = get_logger("trw-train")
    g = _load_graph(args.graph)
    cfg = Node2VecConfig(dim=args.dim, walk_length=args.walk_length,
                         window_size=args.window, p=args.p, q=args.q,
                         learning_rate=args.lr, seed=args.seed,
                         update_mode=args.update_mode)
    n2v = Node2Vec(g, cfg)
    metrics = MetricsWriter(args.metrics or None)
    import tempfile

    import jax.numpy as jnp

    targets = jnp.arange(g.num_nodes, dtype=jnp.int32)

    def step_fn(state, epoch):
        params, opt_state, loss = n2v.epoch_step(
            state["params"], state["opt"], targets, jnp.uint32(epoch))
        metrics.emit(epoch=epoch, loss=float(loss))
        if epoch % 10 == 0:
            log.info("epoch %d loss %.4f", epoch, float(loss))
        return {"params": params, "opt": opt_state}

    params, opt_state = n2v.init()
    # Without --checkpoint-dir no periodic snapshots are written (a user
    # who didn't ask for checkpoints shouldn't pay multi-GB table dumps
    # every N epochs); a scratch dir exists so a SIGTERM preemption can
    # still save once, and is removed after a clean run.  EXCEPT when
    # --max-retries asks for fault replay: retries restore from the last
    # snapshot, so periodic saves (into scratch if need be) stay on —
    # otherwise every retry would replay from epoch 0.
    scratch = None if args.checkpoint_dir else tempfile.mkdtemp(
        prefix="trw_train_")
    periodic = bool(args.checkpoint_dir) or args.max_retries > 0
    result = run_resumable(
        step_fn, {"params": params, "opt": opt_state}, args.epochs,
        ElasticConfig(ckpt_dir=args.checkpoint_dir or scratch,
                      every_steps=(args.checkpoint_every if periodic
                                   else args.epochs + 1),
                      heartbeat_path=args.heartbeat or None,
                      max_retries=args.max_retries,
                      save_final=bool(args.checkpoint_dir)))
    if result.preempted:
        log.warning("preempted at epoch %d (checkpointed to %s; rerun with "
                    "--checkpoint-dir to resume)", result.steps_done,
                    args.checkpoint_dir or scratch)
    elif scratch is not None:
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    emb = np.asarray(n2v.embeddings(result.state["params"]))
    np.save(args.out, emb)
    metrics.close()
    log.info("saved %s embeddings -> %s", emb.shape, args.out)


def kg_train_main(argv=None):
    """Train KG embeddings over triples walks (models/kge.py)."""
    ap = argparse.ArgumentParser(prog="trw-train-kg")
    ap.add_argument("triples", help=".npz with head/rel/tail arrays, or "
                                    "grid:<side>[:seed] synthetic")
    ap.add_argument("-o", "--out", default="kg_embeddings.npz",
                    help="output .npz with entities/relations arrays")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--walk-length", type=int, default=20)
    ap.add_argument("--window", type=int, default=3,
                    help="context window (skipgram/cbow objectives)")
    ap.add_argument("--objective", default="transe",
                    choices=["transe", "distmult", "rotate", "skipgram", "cbow"])
    ap.add_argument("--negatives", type=int, default=8,
                    help="corrupted negatives per positive "
                         "(pair objectives)")
    ap.add_argument("--margin", type=float, default=2.0)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--checkpoint-every", type=int, default=25)
    ap.add_argument("--heartbeat", default="",
                    help="liveness file for external stall detection")
    ap.add_argument("--max-retries", type=int, default=0,
                    help="restore-and-replay retries on device faults")
    ap.add_argument("--metrics", default="", help="JSONL metrics path")
    ap.add_argument("--eval-holdout", type=float, default=0.0,
                    help=">0 holds out this fraction of triples and prints "
                         "filtered tail-ranking MRR/Hits@10 after training "
                         "(pair objectives only)")
    ap.add_argument("--update-mode", default="dense",
                    choices=["dense", "sparse"],
                    help="sparse = touched-rows lazy Adam (optimizer "
                         "traffic scales with the batch, not the entity "
                         "vocabulary; pair objectives only)")
    args = ap.parse_args(argv)

    from torch_random_walk_tpu.graph.triples import TriplesGraph
    from torch_random_walk_tpu.models.kge import KGEmbedding, KGEmbeddingConfig
    from torch_random_walk_tpu.utils.logging import MetricsWriter, get_logger
    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()
    log = get_logger("trw-train-kg")
    if args.triples.startswith("grid:"):
        from torch_random_walk_tpu.graph.datasets import synthetic_grid_kg

        parts = args.triples.split(":")
        side = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 0
        _, triples, _ = synthetic_grid_kg(side, seed=seed)
    else:
        with np.load(args.triples) as data:
            triples = np.stack([data["head"], data["rel"], data["tail"]],
                               axis=1)
    test = None
    if args.eval_holdout > 0:
        if args.objective not in ("transe", "distmult", "rotate"):
            ap.error("--eval-holdout needs a triple-scoring objective "
                     "(transe, distmult or rotate); the co-occurrence "
                     "objectives have no tail-ranking score")
        rng = np.random.default_rng(args.seed)
        perm = rng.permutation(triples.shape[0])
        k = int(args.eval_holdout * triples.shape[0])
        if k < 1:
            ap.error(f"--eval-holdout {args.eval_holdout} of "
                     f"{triples.shape[0]} triples holds out 0 — raise the "
                     "fraction")
        test, train_triples = triples[perm[:k]], triples[perm[k:]]
    else:
        train_triples = triples
    # Id spaces sized from the FULL triples array: entities/relations that
    # only occur in the held-out split must still get table rows.
    graph = TriplesGraph.from_arrays(
        train_triples,
        num_entities=int(max(triples[:, 0].max(), triples[:, 2].max())) + 1,
        num_relations=int(triples[:, 1].max()) + 1)
    cfg = KGEmbeddingConfig(dim=args.dim, walk_length=args.walk_length,
                            window_size=args.window,
                            objective=args.objective,
                            num_negatives=args.negatives, margin=args.margin,
                            learning_rate=args.lr, seed=args.seed,
                            update_mode=args.update_mode)
    kge = KGEmbedding(graph, cfg)
    metrics = MetricsWriter(args.metrics or None)
    params, opt_state = kge.init()
    import tempfile

    import jax.numpy as jnp

    from torch_random_walk_tpu.utils.elastic import (
        ElasticConfig,
        run_resumable,
    )

    targets = jnp.arange(graph.num_entities, dtype=jnp.int32)

    def step_fn(state, epoch):
        p, o, loss = kge.epoch_step(state["params"], state["opt"], targets,
                                    epoch)
        metrics.emit(epoch=epoch, loss=float(loss))
        if epoch % 10 == 0:
            log.info("epoch %d loss %.4f", epoch, float(loss))
        return {"params": p, "opt": o}

    # Same preemption/fault contract as trw-train: periodic snapshots only
    # when asked (or when retries need a restore point); a scratch dir
    # covers SIGTERM checkpoint-and-exit either way.
    scratch = None if args.checkpoint_dir else tempfile.mkdtemp(
        prefix="trw_train_kg_")
    periodic = bool(args.checkpoint_dir) or args.max_retries > 0
    result = run_resumable(
        step_fn, {"params": params, "opt": opt_state}, args.epochs,
        ElasticConfig(ckpt_dir=args.checkpoint_dir or scratch,
                      every_steps=(args.checkpoint_every if periodic
                                   else args.epochs + 1),
                      heartbeat_path=args.heartbeat or None,
                      max_retries=args.max_retries,
                      save_final=bool(args.checkpoint_dir)))
    if result.preempted:
        log.warning("preempted at epoch %d (checkpointed to %s; rerun with "
                    "--checkpoint-dir to resume)", result.steps_done,
                    args.checkpoint_dir or scratch)
    elif scratch is not None:
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    params = result.state["params"]
    ent = np.asarray(kge.model.entity_embeddings(params))
    rel = np.asarray(kge.model.relation_embeddings(params))
    np.savez(args.out, entities=ent, relations=rel)
    metrics.close()
    log.info("saved %s entity + %s relation embeddings -> %s",
             ent.shape, rel.shape, args.out)
    if test is not None and args.objective in ("transe", "distmult", "rotate"):
        from torch_random_walk_tpu.models.eval import kg_tail_ranking_metrics

        m = kg_tail_ranking_metrics(ent, rel, test, score=args.objective,
                                    filter_triples=triples)
        print(json.dumps({"filtered_" + k: round(v, 4)
                          for k, v in m.items()}))


def bench_main(argv=None):
    """Delegates to the repo-root bench harness semantics."""
    ap = argparse.ArgumentParser(prog="trw-bench")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=16_384)
    ap.add_argument("--walk-length", type=int, default=80)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from torch_random_walk_tpu.ops.walk import walk
    from torch_random_walk_tpu.utils.profiling import (
        StepTimer,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    g = _load_graph(f"synth:{args.nodes}:{args.degree}")
    targets = jnp.arange(args.walkers, dtype=jnp.int32) % g.num_nodes
    timer = StepTimer()
    results = {}
    for name, (p, q) in [("uniform", (1.0, 1.0)), ("node2vec", (0.5, 2.0))]:
        dt = timer.time(lambda t: walk(g, target_nodes=t, p=p, q=q,
                                       walk_length=args.walk_length, seed=7),
                        targets, warmup=1, iters=3)
        results[f"{name}_steps_per_sec"] = round(
            args.walkers * args.walk_length / dt, 1)
    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results))


if __name__ == "__main__":  # pragma: no cover
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    {"walk": walk_main, "train": train_main, "bench": bench_main}[cmd](
        sys.argv[2:])
