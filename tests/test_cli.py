"""CLI entry points (torch_random_walk_tpu/cli.py) end-to-end, tiny sizes.

These are the user-facing executables (pyproject [project.scripts]); they
regressed once before (an unreachable-TPU hang in the example scripts), so
every command gets an in-process pytest run.
"""

import json
import os

import numpy as np
import pytest

from torch_random_walk_tpu import cli


def test_walk_main(tmp_path):
    out = str(tmp_path / "walks.npy")
    cli.walk_main(["synth:200:4", "-o", out, "--walkers", "50",
                   "--walk-length", "7", "-p", "0.5", "-q", "2.0"])
    walks = np.load(out)
    assert walks.shape == (50, 8)
    assert walks.min() >= 0 and walks.max() < 200


def test_train_main(tmp_path):
    out = str(tmp_path / "emb.npy")
    metrics = str(tmp_path / "m.jsonl")
    cli.train_main(["synth:100:4", "-o", out, "--dim", "8",
                    "--walk-length", "6", "--epochs", "3",
                    "--metrics", metrics])
    emb = np.load(out)
    assert emb.shape == (100, 8)
    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) == 3 and all(np.isfinite(l["loss"]) for l in lines)


def test_train_main_checkpointing(tmp_path):
    out = str(tmp_path / "emb.npy")
    ckpt = str(tmp_path / "ckpt")
    cli.train_main(["synth:100:4", "-o", out, "--dim", "8",
                    "--walk-length", "6", "--epochs", "4",
                    "--checkpoint-dir", ckpt, "--checkpoint-every", "2"])
    assert os.path.exists(os.path.join(ckpt, "meta.json"))


def _save_triples(path, triples):
    t = np.asarray(triples)
    np.savez(path, head=t[:, 0], rel=t[:, 1], tail=t[:, 2])


def test_kg_train_main(tmp_path, capsys):
    npz = str(tmp_path / "kg.npz")
    _save_triples(npz, [(i, 0, i + 1) for i in range(20)])
    out = str(tmp_path / "kg_emb.npz")
    cli.kg_train_main([npz, "-o", out, "--dim", "8", "--epochs", "5",
                       "--eval-holdout", "0.2"])
    with np.load(out) as data:
        assert data["entities"].shape == (21, 8)
        assert data["relations"].shape == (1, 8)
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    m = json.loads(printed)
    assert 0.0 <= m["filtered_mrr"] <= 1.0


def test_kg_train_main_grid_sparse(tmp_path):
    out = str(tmp_path / "kg_emb.npz")
    cli.kg_train_main(["grid:6", "-o", out, "--dim", "8", "--epochs", "3",
                       "--update-mode", "sparse"])
    with np.load(out) as data:
        assert data["entities"].shape == (36, 8)


def test_kg_train_main_holdout_guards(tmp_path):
    npz = str(tmp_path / "kg.npz")
    _save_triples(npz, [(0, 0, 1), (1, 0, 2)])
    with pytest.raises(SystemExit):
        cli.kg_train_main([npz, "--objective", "skipgram",
                           "--eval-holdout", "0.5"])
    with pytest.raises(SystemExit):
        cli.kg_train_main([npz, "--eval-holdout", "0.01"])
