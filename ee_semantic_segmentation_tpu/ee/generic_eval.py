"""Generic mean-metric evaluators (the funcs.py equivalents).

Re-designs /root/reference/funcs.py:70-162:

* ``Accumulator`` — positional float accumulator (:70-78),
* ``eval_results`` — mean of a scalar loss/metric over a loader, with
  ``pred_first`` dispatch (nn.Module-style metrics take (pred, target);
  sklearn-style take (target, pred), :80-129), ``ae_mode`` (targets are the
  inputs), optional input ``transform``, ``count_one`` batch-counting,
* ``eval_branches`` — per-exit mean metric over a loader returning
  ``{'b1': ..., ..., 'out': ...}`` (:132-162),
* ``repeat_tensor`` — tile a batch along a new exit axis (:6-38).

Here "net" is any callable ``images -> logits`` (single-exit) or
``images -> (E, N, H, W, C)`` (multi-exit), typically a jitted forward
closed over params.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class Accumulator:
    def __init__(self, n: int):
        self.data = [0.0] * n

    def add(self, *args):
        self.data = [a + float(b) for a, b in zip(self.data, args)]

    def reset(self):
        self.data = [0.0] * len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


def repeat_tensor(x, n: int):
    """(N, ...) -> (N, n, ...): tile along a new per-sample exit axis
    (funcs.py:6-38, loop-free)."""
    x = jnp.asarray(x)
    return jnp.broadcast_to(x[:, None], (x.shape[0], n) + x.shape[1:])


class eval_results:
    """Mean scalar metric over a loader (funcs.py:80-129)."""

    def __init__(self, pred_first: bool = True, ae_mode: bool = False,
                 transform=None, count_one: bool = False):
        self.pred_first = pred_first
        self.ae_mode = ae_mode
        self.transform = transform
        self.count_one = count_one

    def __call__(self, net, data_iter, loss):
        tracker = Accumulator(2)
        for batch in data_iter:
            x = batch["image"]
            y = x if self.ae_mode else batch["label"]
            count = int(batch.get("count", len(x)))
            x_in = self.transform(x) if self.transform else x
            pred = net(jnp.asarray(x_in))
            args = (pred, jnp.asarray(y)) if self.pred_first else (jnp.asarray(y), pred)
            tracker.add(float(loss(*args)), 1 if self.count_one else count)
        return tracker[0] / tracker[1]


class eval_branches:
    """Per-exit mean metric -> {'b1': ..., 'out': ...} (funcs.py:132-162)."""

    def __init__(self, n: int, ae_mode: bool = False, transform=None,
                 pred_first: bool = True):
        self.n_branches = n
        self.ae_mode = ae_mode
        self.transform = transform
        self.pred_first = pred_first

    def __call__(self, net, data_iter, loss):
        tracker = Accumulator(self.n_branches + 2)
        for batch in data_iter:
            x = batch["image"]
            y = x if self.ae_mode else batch["label"]
            count = int(batch.get("count", len(x)))
            x_in = self.transform(x) if self.transform else x
            y_hat = net(jnp.asarray(x_in))  # (E, N, H, W, C)
            y = jnp.asarray(y)
            vals = []
            for i in range(self.n_branches + 1):
                args = (y_hat[i], y) if self.pred_first else (y, y_hat[i])
                vals.append(float(loss(*args)))
            tracker.add(*vals, 1)
        res = {f"b{i + 1}": tracker[i] / tracker[-1] for i in range(self.n_branches)}
        res["out"] = tracker[-2] / tracker[-1]
        return res
