"""Failure-detection / elastic-resume tests (utils/elastic.py).

The invariant under test: a trainer run that is killed (preempted or
faulted) and resumed from checkpoint is BIT-IDENTICAL to the uninterrupted
run, because every kernel keys its randomness on (seed, step) threefry
counters — the framework's determinism contract (SURVEY.md §5; the
reference's per-walker curand streams at
/root/reference/csrc/cuda/rw_cuda.cu:72-73 pin the same shape per walker).
"""

import os
import signal

import numpy as np
import jax
import jax.numpy as jnp

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
from torch_random_walk_tpu.utils.elastic import (
    ElasticConfig,
    Heartbeat,
    run_resumable,
)


def toy_graph():
    rng = np.random.default_rng(0)
    n = 64
    src = np.concatenate([np.arange(n), rng.integers(0, n, 2 * n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, 2 * n)])
    return CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)


def make_step(n2v, targets):
    def step_fn(state, step):
        params, opt_state = state
        params, opt_state, _ = n2v.epoch_step(params, opt_state, targets,
                                              jnp.uint32(step))
        return (params, opt_state)

    return step_fn


def assert_tree_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b), strict=True):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestRunResumable:
    def test_clean_run_and_final_checkpoint(self, tmp_path):
        g = toy_graph()
        n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3))
        targets = jnp.arange(g.num_nodes, dtype=jnp.int32)
        step_fn = make_step(n2v, targets)
        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "ck"), every_steps=3)
        res = run_resumable(step_fn, n2v.init(), 7, cfg)
        assert res.steps_done == 7 and not res.preempted
        assert res.resumed_from is None
        # Final checkpoint restores to the finished state.
        from torch_random_walk_tpu.utils import checkpoint

        restored, step = checkpoint.restore(cfg.ckpt_dir, n2v.init())
        assert step == 7
        assert_tree_equal(restored, res.state)

    def test_resume_is_bit_identical(self, tmp_path):
        g = toy_graph()
        n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3))
        targets = jnp.arange(g.num_nodes, dtype=jnp.int32)
        step_fn = make_step(n2v, targets)

        ref = run_resumable(
            step_fn, n2v.init(), 10,
            ElasticConfig(ckpt_dir=str(tmp_path / "ref"), every_steps=100))

        # Interrupted run: 4 steps, then a fresh run_resumable resumes at 4.
        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "int"), every_steps=2)
        first = run_resumable(step_fn, n2v.init(), 4, cfg)
        assert first.steps_done == 4
        second = run_resumable(step_fn, n2v.init(), 10, cfg)
        assert second.resumed_from == 4
        assert second.steps_done == 10
        assert_tree_equal(ref.state, second.state)

    def test_preemption_checkpoints_and_resumes(self, tmp_path):
        g = toy_graph()
        n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3))
        targets = jnp.arange(g.num_nodes, dtype=jnp.int32)
        inner = make_step(n2v, targets)

        def step_fn(state, step):
            if step == 5:  # preemption arrives mid-run
                os.kill(os.getpid(), signal.SIGTERM)
            return inner(state, step)

        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "ck"), every_steps=100)
        res = run_resumable(step_fn, n2v.init(), 10, cfg)
        # The signal lands during step 5; the loop finishes it, then stops.
        assert res.preempted and res.steps_done == 6
        resumed = run_resumable(inner, n2v.init(), 10, cfg)
        assert resumed.resumed_from == 6 and resumed.steps_done == 10

        ref = run_resumable(
            inner, n2v.init(), 10,
            ElasticConfig(ckpt_dir=str(tmp_path / "ref"), every_steps=100))
        assert_tree_equal(ref.state, resumed.state)

    def test_fault_replay_is_bit_identical(self, tmp_path):
        g = toy_graph()
        n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3))
        targets = jnp.arange(g.num_nodes, dtype=jnp.int32)
        inner = make_step(n2v, targets)
        calls = {"n": 0}

        class FakeDeviceFault(Exception):
            pass

        def step_fn(state, step):
            calls["n"] += 1
            if calls["n"] == 6:  # async-style fault partway through
                raise FakeDeviceFault("HBM parity error")
            return inner(state, step)

        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "ck"), every_steps=2,
                            max_retries=1, retryable=(FakeDeviceFault,))
        res = run_resumable(step_fn, n2v.init(), 8, cfg)
        assert res.retries_used == 1 and res.steps_done == 8

        ref = run_resumable(
            inner, n2v.init(), 8,
            ElasticConfig(ckpt_dir=str(tmp_path / "ref"), every_steps=100))
        assert_tree_equal(ref.state, res.state)

    def test_fault_without_retries_raises(self, tmp_path):
        def step_fn(state, step):
            raise jax.errors.JaxRuntimeError("device lost")

        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "ck"))
        try:
            run_resumable(step_fn, {"x": jnp.zeros(2)}, 3, cfg)
        except jax.errors.JaxRuntimeError:
            pass
        else:
            raise AssertionError("fault should propagate at max_retries=0")


class TestHeartbeat:
    def test_beat_and_stall_detection(self, tmp_path):
        path = str(tmp_path / "hb.json")
        assert Heartbeat.is_stalled(path, 1.0)  # absent = stalled
        hb = Heartbeat(path)
        hb.beat(7, loss=0.5)
        record = Heartbeat.read(path)
        assert record["step"] == 7 and record["loss"] == 0.5
        assert not Heartbeat.is_stalled(path, 60.0)
        assert Heartbeat.is_stalled(path, 5.0, now=record["ts"] + 10.0)

    def test_wired_into_run_resumable(self, tmp_path):
        g = toy_graph()
        n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3))
        targets = jnp.arange(g.num_nodes, dtype=jnp.int32)
        hb_path = str(tmp_path / "hb.json")
        cfg = ElasticConfig(ckpt_dir=str(tmp_path / "ck"), every_steps=10,
                            heartbeat_path=hb_path)
        run_resumable(make_step(n2v, targets), n2v.init(), 4, cfg)
        assert Heartbeat.read(hb_path)["step"] == 4
