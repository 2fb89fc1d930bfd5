

class TestCollectBounded:
    """collect_bounded: the uniform loud-raise driver-collect cap."""

    def test_within_cap_passthrough(self):
        import pandas as pd
        import pyarrow as pa

        from distributed_system___ocr_ray.pipelines.relational import (
            collect_bounded,
        )

        tbl = pa.table({"a": [1, 2, 3]})
        df = collect_bounded(tbl, what="t", alternative="x")
        assert list(df["a"]) == [1, 2, 3]
        df2 = collect_bounded(pd.DataFrame({"a": [1]}), what="t",
                              alternative="x")
        assert len(df2) == 1

    def test_cap_raises_naming_alternative(self):
        import pyarrow as pa
        import pytest

        from distributed_system___ocr_ray.pipelines.relational import (
            CollectCapExceeded,
            collect_bounded,
        )

        tbl = pa.table({"a": list(range(1000))})
        with pytest.raises(CollectCapExceeded, match="bucketed-alternative"):
            collect_bounded(tbl, what="audit pairs",
                            alternative="bucketed-alternative",
                            cap_rows=10)
        with pytest.raises(CollectCapExceeded, match="exceeds"):
            collect_bounded(tbl, what="audit pairs",
                            alternative="bucketed-alternative", cap_bytes=16)

    def test_dataset_checked_before_driver_transfer(self, ray_session):
        import ray.data as rd
        import pytest

        from distributed_system___ocr_ray.pipelines.relational import (
            CollectCapExceeded,
            collect_bounded,
        )

        ds = rd.range(10_000)
        with pytest.raises(CollectCapExceeded):
            collect_bounded(ds, what="d", alternative="a", cap_rows=100)
        ok = collect_bounded(rd.range(5), what="d", alternative="a")
        assert len(ok) == 5
