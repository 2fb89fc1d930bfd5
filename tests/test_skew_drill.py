"""Reassembly skew drill (VERDICT r4 #5): one pathological
many-span document among many small ones -- the salted two-level path
must produce byte-identical output while bounding the per-reducer row
count its first stage absorbs to ~1/S of the hot partition.

Full-scale numbers (1M docs, one 100k-span doc) live in BASELINE.md via
``tools/measure_skew_drill.py``; this test pins correctness + the bound
at pytest scale.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.usefixtures("ray_session")
class TestReassemblySkew:
    def _fixture(self, n_docs=3000, hot=2000):
        from measure_skew_drill import build_skewed_input

        return build_skewed_input(n_docs, hot, num_partitions=16)

    def test_salted_identical_output_under_skew(self):
        import ray.data as rd

        from distributed_system___ocr_ray.stages.reassemble import (
            reassemble, reassemble_salted,
        )

        tbl = self._fixture()
        ds = rd.from_arrow(tbl)
        plain = reassemble(ds, coalesce_blocks=8).to_pandas()
        salted = reassemble_salted(
            rd.from_arrow(tbl), num_salts=4, coalesce_blocks=8).to_pandas()
        plain = plain.sort_values("doc_id").reset_index(drop=True)
        salted = salted.sort_values("doc_id").reset_index(drop=True)
        assert len(plain) == len(salted) == 3001
        assert (plain["doc_id"] == salted["doc_id"]).all()
        # spans sequences identical, INCLUDING the 2000-span hot doc's order
        for a, b in zip(plain["spans"], salted["spans"]):
            assert list(a) == list(b)
        hot_spans = plain.loc[plain["doc_id"] == 0, "spans"].iloc[0]
        assert [s["order"] for s in hot_spans] == list(range(2000))

    def test_stage1_group_bound(self):
        """The salted first stage's largest group is ~1/S of the hot
        partition: the skew pressure one reducer absorbs is bounded."""
        tbl = self._fixture()
        salts = 4
        pdf = pd.DataFrame({
            "part": tbl.column("part").to_numpy(),
            "salt": (tbl.column("offset").to_numpy().astype(np.int64)
                     * 2654435761 % salts).astype(np.int32),
        })
        plain_max = int(pdf.groupby("part").size().max())
        salted_max = int(pdf.groupby(["part", "salt"]).size().max())
        assert plain_max >= 2000  # the hot doc dominates its partition
        # bound with 25% slack over the ideal 1/S split
        assert salted_max <= plain_max // salts * 5 // 4
