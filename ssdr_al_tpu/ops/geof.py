"""Per-point geometric features (linearity, planarity, scattering, verticality).

TPU-native replacement for the reference's OpenMP/Eigen C++ `compute_geof`
(N3 in SURVEY.md: partition/ply_c/ply_c.cpp:385-464): for each point, the
covariance of its k-NN neighborhood (self + k neighbors) is eigendecomposed
and the sorted eigenvalues λ1 ≥ λ2 ≥ λ3 with eigenvectors v1..v3 give
    linearity   = (√λ1 − √λ2) / √λ1
    planarity   = (√λ2 − √λ3) / √λ1
    scattering  =  √λ3 / √λ1
    verticality = u_z / ‖u‖,  u_i = Σ_j λ_j |v_j[i]|
The reference loops points on the CPU with per-point 3×3 EigenSolver calls;
here the whole cloud is one batched gather + covariance + *closed-form*
symmetric 3×3 eigendecomposition (trigonometric eigenvalues + spectral-
projector eigenvectors) — pure VPU math, no LAPACK-style iteration, so it
compiles to a handful of fused elementwise ops on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(cov):
    """Batched closed-form symmetric 3×3 eigendecomposition.

    cov: [..., 3, 3] symmetric. Returns (lam [..., 3] descending,
    vec [..., 3, 3] with columns = unit eigenvectors, ordered to match lam).
    Eigenvector signs are arbitrary (the geof formulas only use |v|).
    """
    cov = jnp.asarray(cov, jnp.float32)
    a00, a01, a02 = cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2]
    a11, a12, a22 = cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.maximum(p, _EPS)

    b00, b11, b22 = (a00 - q) / p_safe, (a11 - q) / p_safe, (a22 - q) / p_safe
    b01, b02, b12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    lam = jnp.stack([l1, l2, l3], axis=-1)  # descending by construction

    # Eigenvector for λ via the spectral projector (A−λa I)(A−λb I): every
    # nonzero column lies in the λ-eigenspace; take the largest column.
    def eig_vec(la, lb):
        m1 = cov - la[..., None, None] * jnp.eye(3, dtype=cov.dtype)
        m2 = cov - lb[..., None, None] * jnp.eye(3, dtype=cov.dtype)
        proj = jnp.einsum("...ij,...jk->...ik", m1, m2)
        norms = jnp.sum(proj * proj, axis=-2)  # column sq-norms [..., 3]
        col = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(proj, col[..., None, None], axis=-1)[..., 0]
        n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
        # isotropic fallback: any unit vector is an eigenvector
        fallback = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], cov.dtype), v.shape
        )
        return jnp.where(n > 1e-6, v / n, fallback)

    v1 = eig_vec(l2, l3)
    v3 = eig_vec(l1, l2)
    v2 = jnp.cross(v3, v1)  # symmetric ⇒ eigenvectors orthogonal
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, axis=-1, keepdims=True), _EPS))
    v2 = v2 / n2
    vec = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return lam, vec


@functools.partial(jax.jit, static_argnums=(2,))
def geometric_features(xyz, neighbor_idx, chunk=8192):
    """xyz: [N, 3] float32; neighbor_idx: [N, k] int32 (k neighbors, NOT
    including self — the point itself is prepended, matching ply_c.cpp:400-412).
    Returns [N, 4] float32: linearity, planarity, scattering, verticality.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    n, k = neighbor_idx.shape
    n_pad = ((n + chunk - 1) // chunk) * chunk
    idx = jnp.pad(neighbor_idx, ((0, n_pad - n), (0, 0)))
    self_idx = jnp.pad(jnp.arange(n, dtype=neighbor_idx.dtype), (0, n_pad - n))

    def body(_, ci):
        start = ci * chunk
        nb = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=0)        # [c, k]
        si = jax.lax.dynamic_slice_in_dim(self_idx, start, chunk, axis=0)   # [c]
        full = jnp.concatenate([si[:, None], nb], axis=1)                   # [c, k+1]
        pos = xyz[full]                                                     # [c, k+1, 3]
        centered = pos - jnp.mean(pos, axis=1, keepdims=True)
        cov = jnp.einsum(
            "cki,ckj->cij", centered, centered,
            precision=jax.lax.Precision.HIGHEST,
        ) / float(k + 1)
        lam, vec = eigh3x3(cov)
        lam = jnp.maximum(lam, 0.0)
        sq = jnp.sqrt(lam)
        s1 = jnp.maximum(sq[:, 0], _EPS)
        linearity = (sq[:, 0] - sq[:, 1]) / s1
        planarity = (sq[:, 1] - sq[:, 2]) / s1
        scattering = sq[:, 2] / s1
        unary = jnp.einsum("cj,cij->ci", lam, jnp.abs(vec))                 # [c, 3]
        norm = jnp.maximum(jnp.linalg.norm(unary, axis=1), _EPS)
        verticality = unary[:, 2] / norm
        return None, jnp.stack([linearity, planarity, scattering, verticality], axis=1)

    _, out = jax.lax.scan(body, None, jnp.arange(n_pad // chunk))
    return out.reshape(n_pad, 4)[:n]
