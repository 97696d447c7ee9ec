"""Rigid transform estimation: masked Kabsch/SVD fit and batched RANSAC.

TPU-native equivalents of estimateTransformation (basic_algorithms.h:56-95)
and estimateTransformationRANSAC (basic_algorithms.h:106-195).  The reference
runs a serial hypothesis loop with rejection-sampled index triples; here all
hypotheses are evaluated as one batched 3x3-SVD problem, and distinct random
triples are drawn with the Gumbel-top-k trick so degenerate duplicate samples
cannot occur (the reference rejects duplicates in a while loop,
basic_algorithms.h:118-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch(P, Q, mask):
    """Masked rigid fit Q ~ R @ P + t (basic_algorithms.h:56-95).

    Args:
      P, Q: f32[..., N, 3] point sets (last-frame, current-frame).
      mask: bool[..., N] valid points.

    Returns (T f32[..., 4, 4], ok bool[...]).
    """
    m = mask.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=-2), 1e-9)
    cp = jnp.sum(P * m, axis=-2) / cnt
    cq = jnp.sum(Q * m, axis=-2) / cnt
    Pc = (P - cp[..., None, :]) * m
    Qc = (Q - cq[..., None, :]) * m

    # Cross-covariance H = Pc^T Qc (3x3).
    H = jnp.einsum("...ni,...nj->...ij", Pc, Qc)

    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R = V @ jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(R)
    # Reflection fix: flip the third column of V (basic_algorithms.h:81-84).
    Vfix = V.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    R = Vfix @ jnp.swapaxes(U, -1, -2)

    t = cq - jnp.einsum("...ij,...j->...i", R, cp)

    T = jnp.zeros(P.shape[:-2] + (4, 4), jnp.float32)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    ok = jnp.sum(mask, axis=-1) >= 3
    return T, ok


def apply_transform(T, pts):
    """T[..., 4, 4] applied to pts[..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def ransac_transform(
    rng: jax.Array,
    P: jax.Array,        # f32[N, 3]
    Q: jax.Array,        # f32[N, 3]
    mask: jax.Array,     # bool[N]
    n_iter: int,
    threshold: float,
    refit_with_inliers: bool,
):
    """estimateTransformationRANSAC (basic_algorithms.h:106-195), batched.

    Returns (T, inlier_mask, n_inliers, mse_inliers, first_inlier_idx).
    The reference's early break at >90% inliers only saves time, not changing
    the argmax result given identical hypotheses, so it is dropped.
    """
    N = P.shape[0]

    # Distinct random triples per hypothesis via Gumbel top-k over valid pts.
    g = jax.random.gumbel(rng, (n_iter, N))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, triple_idx = jax.lax.top_k(g, 3)  # i32[n_iter, 3]

    Ps = P[triple_idx]  # [n_iter, 3, 3]
    Qs = Q[triple_idx]
    T_h, _ = kabsch(Ps, Qs, jnp.ones((n_iter, 3), bool))

    # Inlier counting per hypothesis (basic_algorithms.h:133-143).
    Pt = apply_transform(T_h, jnp.broadcast_to(P, (n_iter, N, 3)))
    err = jnp.linalg.norm(Pt - Q[None], axis=-1)
    inl = mask[None, :] & (err < threshold)
    counts = jnp.sum(inl, axis=1)

    best = jnp.argmax(counts)  # first max wins, matching the strict '>' update
    best_T = T_h[best]
    best_inl = inl[best]
    n_inl = counts[best]

    if refit_with_inliers:
        refit_T, refit_ok = kabsch(P, Q, best_inl)
        use_refit = refit_ok & (n_inl >= 3)
        best_T = jnp.where(use_refit, refit_T, best_T)

    # Inlier MSE under the returned transform (basic_algorithms.h:177-194;
    # squared-norm errors averaged over inliers).
    Pf = apply_transform(best_T[None], P[None])[0]
    sq = jnp.sum((Pf - Q) ** 2, axis=-1)
    mse = jnp.sum(jnp.where(best_inl, sq, 0.0)) / jnp.maximum(n_inl, 1)

    first_inlier = jnp.argmax(best_inl)  # lowest index inlier
    has_inlier = jnp.any(best_inl)
    first_inlier = jnp.where(has_inlier, first_inlier, 0)

    return best_T, best_inl, n_inl, mse, first_inlier
