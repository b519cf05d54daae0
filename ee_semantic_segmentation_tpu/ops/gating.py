"""Early-exit gating metrics, vectorized on device.

Re-implements the reference's gating quantities as pure JAX (the reference
computed them per image on CPU via scipy/skimage — eval_br_ent.py:19-36,
sim_metrics.py — forcing a device->host sync per image per exit):

* ``norm_entropy`` — pixelwise entropy of softmax probs normalized to base
  ``n_classes`` (image mean; optional max/min block-pooling before the mean,
  eval_br_ent.py:26-36).  skimage ``block_reduce`` pads partial edge blocks
  with 0 — reproduced (it biases min-pooling at borders; documented quirk).
* ``ssim_int`` — skimage ``structural_similarity`` on integer label maps:
  7x7 uniform windows, K1=.01, K2=.03, unbiased covariance normalization
  N/(N-1), mean over fully valid windows (sim_metrics.py:15-37 wraps this
  with ``data_range=n_classes-1``).
* ``mse_int`` — plain mean squared error on label maps (sim_metrics.py:39).
* ``nmi`` — normalized mutual information (H(a)+H(b))/H(a,b) from the joint
  label histogram (sim_metrics.py:58; base-invariant).
* ``vi`` / ``seg_comp`` — variation of information = H(a|b) + H(b|a) in bits
  from the contingency table, with skimage's ``ignore_labels`` semantics
  (pixels whose *first*-image label is ignored get zero weight)
  (sim_metrics.py:78-123).

All functions are fixed-shape; label histograms are one-hot matmuls (MXU
work, not host loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIM_GREATER = ("ssim", "nmi")  # gate fires on sim > tau for these (eval_br_sim.py:43)


# ------------------------------------------------------------------ entropy
def pixel_entropy(probs: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(..., C) probabilities -> (...,) entropy normalized to base n_classes."""
    p = jnp.clip(probs, 1e-12, 1.0)
    h = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(p), 0.0), axis=-1)
    return h / jnp.log(float(n_classes))


def _block_reduce(x: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    """skimage.measure.block_reduce over trailing (H, W): pad partial blocks
    with 0 (cval=0), reduce with max or min."""
    h, w = x.shape[-2:]
    ph = (-h) % size
    pw = (-w) % size
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, pad, constant_values=0.0)
    nh, nw = x.shape[-2] // size, x.shape[-1] // size
    x = x.reshape(x.shape[:-2] + (nh, size, nw, size))
    red = jnp.max if mode == "max" else jnp.min
    return red(x, axis=(-3, -1))


def norm_entropy(probs_hwc: jnp.ndarray, n_classes: int, pool: str = "none", size: int = 1) -> jnp.ndarray:
    """Image-level normalized entropy (img_norm_entropy, eval_br_ent.py:19-36).

    probs_hwc: (H, W, C) softmax probabilities.  Returns a scalar.
    """
    ent = pixel_entropy(probs_hwc, n_classes)  # (H, W)
    if pool in ("max", "min") and size != 1:
        ent = _block_reduce(ent, size, pool)
    return jnp.mean(ent)


@functools.partial(jax.jit, static_argnames=("n_classes", "pool", "size"))
def batched_norm_entropy(stacked_logits, n_classes: int, pool: str = "none", size: int = 1):
    """(E, N, H, W, C) logits -> (E, N) mean normalized entropy per image."""
    probs = jax.nn.softmax(stacked_logits.astype(jnp.float32), axis=-1)
    f = lambda p: norm_entropy(p, n_classes, pool, size)
    return jax.vmap(jax.vmap(f))(probs)


# --------------------------------------------------------------- similarity
def _uniform_windows(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean over all fully valid win x win windows -> (H-win+1, W-win+1)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (win, win), (1, 1), "VALID"
    )
    return s / (win * win)


def ssim_int(a: jnp.ndarray, b: jnp.ndarray, data_range: float, win: int = 7) -> jnp.ndarray:
    """skimage structural_similarity defaults on 2-D float inputs."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    ux = _uniform_windows(a, win)
    uy = _uniform_windows(b, win)
    uxx = _uniform_windows(a * a, win)
    uyy = _uniform_windows(b * b, win)
    uxy = _uniform_windows(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def mse_int(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def _joint_hist(a: jnp.ndarray, b: jnp.ndarray, n: int, weights=None) -> jnp.ndarray:
    """(P,) int x (P,) int -> (n, n) joint counts via one-hot matmul."""
    oa = jax.nn.one_hot(a, n, dtype=jnp.float32)
    ob = jax.nn.one_hot(b, n, dtype=jnp.float32)
    if weights is not None:
        oa = oa * weights[:, None]
    return oa.T @ ob


def _entropy_nat(p: jnp.ndarray) -> jnp.ndarray:
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.clip(p, 1e-30, 1.0)), 0.0))


def nmi(a: jnp.ndarray, b: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(H(a) + H(b)) / H(a, b) from the joint label histogram."""
    j = _joint_hist(a.reshape(-1), b.reshape(-1), n_classes)
    p = j / jnp.sum(j)
    ha = _entropy_nat(jnp.sum(p, axis=1))
    hb = _entropy_nat(jnp.sum(p, axis=0))
    hab = _entropy_nat(p.reshape(-1))
    return (ha + hb) / jnp.maximum(hab, 1e-12)


def _vi_terms(a: jnp.ndarray, b: jnp.ndarray, n_classes: int, ignore=()):
    """Conditional entropies (H(b|a), H(a|b)) in bits with skimage's
    ignore_labels semantics (first image's ignored labels drop pixels)."""
    af = a.reshape(-1)
    bf = b.reshape(-1)
    w = jnp.ones_like(af, jnp.float32)
    for ig in ignore:
        w = w * (af != ig).astype(jnp.float32)
    j = _joint_hist(af, bf, n_classes, weights=w)
    tot = jnp.maximum(jnp.sum(j), 1.0)
    p = j / tot
    pa = jnp.sum(p, axis=1)
    pb = jnp.sum(p, axis=0)
    log2 = jnp.log(2.0)
    ha = _entropy_nat(pa) / log2
    hb = _entropy_nat(pb) / log2
    hab = _entropy_nat(p.reshape(-1)) / log2
    # H(b|a) = H(a,b) - H(a);  H(a|b) = H(a,b) - H(b)
    return hab - ha, hab - hb


def vi(a, b, n_classes: int, ignore=()):
    """Variation of information = H(b|a) + H(a|b) (sim_metrics.py:78-99 sums
    both terms)."""
    h_b_a, h_a_b = _vi_terms(a, b, n_classes, ignore)
    return h_b_a + h_a_b


def seg_comp(a, b, n_classes: int, x_y: bool = True, ignore=()):
    """One VI term (sim_metrics.py:101-123): x_y=True -> second term
    (over-segmentation H(a|b)), False -> first (H(b|a))."""
    terms = _vi_terms(a, b, n_classes, ignore)
    return terms[1] if x_y else terms[0]


def similarity(a, b, metric: str, n_classes: int, ignore=()):
    """Dispatch by metric name (the eval_br_sim.py:20-31 registry)."""
    m = metric.lower()
    if m == "ssim":
        return ssim_int(a, b, data_range=n_classes - 1)
    if m == "nmi":
        return nmi(a, b, n_classes)
    if m == "vi":
        return vi(a, b, n_classes, ignore)
    if m == "h_xy":
        return seg_comp(a, b, n_classes, x_y=True, ignore=ignore)
    if m == "h_yx":
        return seg_comp(a, b, n_classes, x_y=False, ignore=ignore)
    return mse_int(a, b)


def batched_similarity(preds, metric: str, n_classes: int, ignore=()):
    """(E, N, H, W) label maps -> (E-1, N) similarity of consecutive exits."""
    f = lambda x, y: similarity(x, y, metric, n_classes, ignore)
    per_image = jax.vmap(f)
    return jax.vmap(per_image)(preds[:-1], preds[1:])
