"""Threshold-sweep tool: trade-off curve math on the tiny model."""

import sys

import numpy as np
import pytest


class _Batches:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_sweep_tradeoff(tiny_model, tiny_state, monkeypatch):
    sys.path.insert(0, "tools")
    from sweep_thresholds import sweep

    rng = np.random.RandomState(21)
    batches = [
        {"image": rng.rand(4, 32, 32, 3).astype(np.float32),
         "label": rng.randint(0, 5, (4, 32, 32)), "count": 4}
        for _ in range(2)
    ]

    rows = sweep(tiny_model, tiny_state, _Batches(batches), 5, "ent",
                 taus=[-1.0, 2.0])
    assert len(rows) == 2
    # tau=-1: nobody exits -> full cost
    assert rows[0]["flops_frac_of_full"] == pytest.approx(1.0)
    assert rows[0]["exit_counts"][-1] == 8
    # tau=2: everybody exits at b1 -> cheaper than full
    assert rows[1]["flops_frac_of_full"] < 1.0
    assert rows[1]["exit_counts"][0] == 8
    table = tiny_model.flops_table()
    full = sum(table["segments"]) + table["branches"][-1]
    assert rows[1]["mean_flops_per_image"] == pytest.approx(table["cumulative_exits"][0])
    assert rows[0]["mean_flops_per_image"] == pytest.approx(full)
