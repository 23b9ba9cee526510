"""Unit tests for the analysis utilities inside benchmarks/ (the scaling
model's projection math and the HLO collective-byte parser) — these back
quantitative claims in BENCHLOG.md, so their arithmetic is pinned here.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "benchmarks", fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestCollectiveBytes:
    def setup_method(self):
        self.mod = _load("trainer_traffic", "trainer_traffic.py")

    def test_sums_result_shapes_per_kind(self):
        hlo = """
  %ar = f32[64,128]{1,0} all-reduce(f32[64,128]{1,0} %x), replica_groups={}
  %ag = (bf16[8,4]{1,0}, u32[16]{0}) all-gather(%a, %b), dimensions={0}
  %cp = s32[10]{0} collective-permute(%c), source_target_pairs={{0,1}}
  %noise = f32[2,2]{1,0} add(f32[2,2] %p, f32[2,2] %q)
"""
        out = self.mod.collective_bytes(hlo)
        assert out["all-reduce"] == 64 * 128 * 4
        assert out["all-gather"] == 8 * 4 * 2 + 16 * 4
        assert out["collective-permute"] == 10 * 4
        assert out["total"] == (out["all-reduce"] + out["all-gather"]
                                + out["collective-permute"])

    def test_start_variants_counted_once(self):
        hlo = "%s = f32[100]{0} all-reduce-start(f32[100] %x)\n"
        assert self.mod.collective_bytes(hlo)["all-reduce"] == 400

    def test_empty_module(self):
        assert self.mod.collective_bytes("")["total"] == 0


class TestScalingModel:
    def setup_method(self):
        self.mod = _load("scaling_model", "scaling_model.py")

    def test_wire_bytes_are_d_independent(self):
        """The O(B) traffic contract: padded wire per chip per step must
        not depend on the shard count."""
        rows = [self.mod.project("uniform", "bench", d, 131_072, 200e9)
                for d in (8, 64, 256)]
        assert len({r["wire_bytes_per_chip_step"] for r in rows}) == 1
        assert len({r["projected_efficiency"] for r in rows}) == 1

    def test_efficiency_decomposition(self):
        r = self.mod.project("node2vec", "products", 8, 131_072, 200e9)
        t = r["t_comp_ms"] + r["t_wire_ms"] + r["t_latency_ms"]
        assert abs(r["projected_efficiency"] - r["t_comp_ms"] / t) < 1e-3
        assert 0 < r["projected_efficiency"] <= 1

    def test_slower_link_lowers_efficiency(self):
        fast = self.mod.project("node2vec", "bench", 8, 131_072, 200e9)
        slow = self.mod.project("node2vec", "bench", 8, 131_072, 2e9)
        assert slow["projected_efficiency"] < fast["projected_efficiency"]

    def test_intra_pod_meets_north_star(self):
        """The >=80% north-star clause under the published ICI figure."""
        ici = 1600e9 / 8
        for family in ("uniform", "node2vec"):
            for shape in ("bench", "products"):
                r = self.mod.project(family, shape, 64, 131_072, ici)
                assert r["projected_efficiency"] >= 0.8, r
