"""KG-triples graph container and builders.

Replaces the reference's ``build_relation_tail_index`` (torch_rw/utils.py:91)
with vectorized NumPy.  Contract kept: triples are (E, 3) [head, relation,
tail] sorted by head; the index is (N, 2) [start, end-inclusive] with (-1,-1)
for heads with no triples.  Within a head's range we sort by (relation, tail)
— same uniform-sampling distribution, deterministic layout (deviation noted
in edge_list.py applies here too).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TriplesGraph:
    """KG triples + per-head range index.

    Fat table (TPU hot path): ``triple_tab[i]`` = (relation_i, tail_i,
    start_tail_i, cnt_tail_i) int32 — one (T, 4) row gather yields the step's
    (relation, tail) output pair AND the next head's sampling range.
    ``node_meta[v]`` = (start_v, cnt_v) int32 for walk entry.
    """

    triples: jnp.ndarray  # (E, 3) [head, relation, tail] sorted by head
    relation_tail_index: jnp.ndarray  # (N, 2) [start, end-inclusive]
    num_entities: int
    num_triples: int
    max_degree: int
    triple_tab: jnp.ndarray | None = None  # (T, 4) int32
    node_meta: jnp.ndarray | None = None   # (N, 2) int32
    num_relations: int = 0

    @property
    def search_iters(self) -> int:
        return max(1, int(math.ceil(math.log2(max(self.max_degree, 2)))) + 1)

    @classmethod
    def from_arrays(cls, triples, num_entities: int | None = None,
                    num_relations: int | None = None) -> "TriplesGraph":
        """``num_entities``/``num_relations`` default to max-id + 1 of the
        GIVEN triples; pass them explicitly when these triples are a subset
        (e.g. a train split) of a larger id space."""
        t = np.asarray(triples, np.int64).reshape(-1, 3)
        if num_entities is None:
            num_entities = int(max(t[:, 0].max(), t[:, 2].max())) + 1 if t.size else 0
        if num_relations is None:
            num_relations = int(t[:, 1].max()) + 1 if t.size else 0
        order = np.lexsort((t[:, 2], t[:, 1], t[:, 0]))
        t = t[order]
        heads = t[:, 0]
        counts = np.bincount(heads, minlength=num_entities)
        starts = np.zeros(num_entities, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ends = starts + counts - 1
        index = np.stack([starts, ends], axis=1)
        index[counts == 0] = -1
        dtype = np.int32 if t.size == 0 or t.max() < 2**31 else np.int64
        triple_tab = node_meta = None
        if num_entities and t.size and t.max() < 2**31:
            cnts = counts  # out-triple count per head (0 = dead end)
            tails = t[:, 2]
            triple_tab = jnp.asarray(np.stack(
                [t[:, 1], tails, starts[tails], cnts[tails]],
                axis=1).astype(np.int32))
            node_meta = jnp.asarray(np.stack(
                [starts, cnts], axis=1).astype(np.int32))
        return cls(
            triples=jnp.asarray(t.astype(dtype)),
            relation_tail_index=jnp.asarray(index.astype(dtype)),
            num_entities=num_entities,
            num_triples=int(t.shape[0]),
            max_degree=int(counts.max()) if num_entities else 0,
            triple_tab=triple_tab,
            node_meta=node_meta,
            num_relations=num_relations,
        )


def build_relation_tail_index(triples_indexed, all_entities):
    """Reference-parity (torch_rw/utils.py:91): returns
    (relation_tail_index, sorted_triples)."""
    ents = np.asarray(all_entities)
    g = TriplesGraph.from_arrays(
        np.asarray(triples_indexed), num_entities=int(ents.max()) + 1
    )
    return g.relation_tail_index, g.triples
