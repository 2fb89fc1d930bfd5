"""Job configuration and pool-sizing policy.

``pool_size`` is the engine analogue of the reference's fleet-sizing formula
(Manager.loadBalance, Manager.java:372-377): need = ceil(inputSize / n),
capped at MAX_INSTANCES = 17 (Manager.java:34). Here the knobs size an
actor pool instead of an EC2 fleet, the cap is the cluster CPU budget, and
``tasks_per_worker`` is the reference's CLI ``n`` (LocalApplication.java:62).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def pool_size(input_size: int, tasks_per_worker: int, max_workers: int) -> int:
    """ceil(input_size / tasks_per_worker), capped -- Manager.java:376-377
    transliterated: ``size % n == 0 ? size/n : size/n + 1`` then min(cap)."""
    if input_size <= 0:
        return 1
    need = -(-input_size // max(tasks_per_worker, 1))
    return max(1, min(need, max_workers))


@dataclass
class JobConfig:
    """Extraction job knobs with scale-conscious defaults."""

    num_partitions: int = 64  # reassembly/checkpoint partitions (P)
    batch_size: int = 1024  # rows per extraction batch
    tasks_per_worker: int = 16  # reference `n`: fragments per actor target
    max_pool: int = 30  # actor-pool cap (cluster CPUs - headroom)
    read_blocks: int | None = None  # read split count (None = 4x CPUs)
    resume: bool = True
    mode: str = "fused"  # "fused" | "split" kind routing
    extra: dict = field(default_factory=dict)

    def pool_for(self, n_work_items: int) -> int:
        return pool_size(n_work_items, self.tasks_per_worker, self.max_pool)
