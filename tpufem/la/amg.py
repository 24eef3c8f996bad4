"""Smoothed-aggregation AMG preconditioner with rigid-body-mode nullspace.

TPU-native equivalent of the reference's hypre BoomerAMG with elasticity
tuning and near-nullspace rigid-body modes (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:720-813 — HMIS/ext+i/numfunctions=2 options —
and the interpolated RBM vectors at :750-798; MFEM mirrors at
MFEM/mechanic2d/asym_elasto_damage_model.cc:1503-1517).

Architecture (TPU-first, not a hypre port):

- **Setup on host** (NumPy/SciPy, one-time per Newton solve): strength
  graph on the node-block matrix, greedy Vanek aggregation (vectorized,
  round-based maximal-independent-set seeding), tentative prolongator
  from per-aggregate QR of the rigid-body modes, Jacobi-smoothed P,
  Galerkin RAP coarse operators, per-level lambda_max estimates.
- **Apply on device** (pure jnp, jit/while_loop-compatible): every level
  operator is a static ELL (width, n) table; the V-cycle is an unrolled
  chain of dense-gather SpMVs + Chebyshev smoothing, so it fuses into
  the existing CG body and runs inside one XLA program. The hierarchy is
  a NamedTuple pytree and is *passed as an argument* to jitted solvers
  (remote-TPU constants rematerialize; see tpufem.utils.pytree).

The preconditioner is symmetric positive definite by construction
(symmetric V(nu,nu)-cycle with polynomial smoothing), so plain CG stays
valid.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import INDEX_DTYPE


# =============================================================================
# host-side setup
# =============================================================================


@dataclasses.dataclass
class AMGOptions:
    """Setup knobs (defaults tuned for P1/Q1 elasticity).

    theta: strength-of-connection drop tolerance on the node graph
      (|s_ij| >= theta*sqrt(s_ii*s_jj)); 0 keeps all connections
      (Vanek's SA default for elasticity).
    smooth_omega: Jacobi prolongator-smoothing weight as a fraction of
      1/lambda_max(D^-1 A); the classical 4/3 * 1/lmax.
    coarse_size: stop coarsening at <= this many dofs; solve dense.
    """

    theta: float = 0.0
    smooth_omega: float = 4.0 / 3.0
    max_levels: int = 12
    coarse_size: int = 512
    cheb_degree: int = 2
    cheb_lmin_ratio: float = 1.0 / 30.0
    cheb_lmax_scale: float = 1.1


def rigid_body_modes(coords: np.ndarray, bs: int,
                     free_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Near-nullspace B (n_dofs, k) for byVDIM vector fields.

    bs=1 -> constants (k=1); bs=2 -> 2 translations + in-plane rotation
    (k=3, the reference's RBM set, FEniCSx/...cc:750-798); bs=3 -> 3
    translations + 3 rotations (k=6). Rows at Dirichlet dofs are zeroed
    (their matrix rows are identity; coupling them into aggregates would
    pollute the coarse space).
    """
    n_nodes = coords.shape[0]
    n = n_nodes * bs
    x = coords[:, 0] if coords.shape[1] > 0 else np.zeros(n_nodes)
    y = coords[:, 1] if coords.shape[1] > 1 else np.zeros(n_nodes)
    z = coords[:, 2] if coords.shape[1] > 2 else np.zeros(n_nodes)
    # center/scale for conditioning of the per-aggregate QR
    xc = x - x.mean() if n_nodes else x
    yc = y - y.mean() if n_nodes else y
    zc = z - z.mean() if n_nodes else z

    if bs == 1:
        B = np.ones((n, 1))
    elif bs == 2:
        B = np.zeros((n, 3))
        B[0::2, 0] = 1.0
        B[1::2, 1] = 1.0
        B[0::2, 2] = -yc
        B[1::2, 2] = xc
    elif bs == 3:
        B = np.zeros((n, 6))
        for i in range(3):
            B[i::3, i] = 1.0
        B[1::3, 3] = -zc
        B[2::3, 3] = yc
        B[0::3, 4] = zc
        B[2::3, 4] = -xc
        B[0::3, 5] = -yc
        B[1::3, 5] = xc
    else:
        raise ValueError(f"unsupported block size {bs}")
    if free_mask is not None:
        B = B * np.asarray(free_mask, dtype=B.dtype)[:, None]
    return B


def _node_strength_graph(A, bs: int, theta: float):
    """Condense the dof matrix to a node graph (block Frobenius norms),
    drop weak couplings, remove the diagonal. Returns symmetric CSR."""
    import scipy.sparse as sp

    coo = A.tocoo()
    n = A.shape[0] // bs
    ni = coo.row // bs
    nj = coo.col // bs
    S = sp.coo_matrix((coo.data * coo.data, (ni, nj)), shape=(n, n)).tocsr()
    S.sum_duplicates()
    S.data = np.sqrt(S.data)
    if theta > 0.0:
        d = S.diagonal()
        coo = S.tocoo()
        scale = np.sqrt(np.abs(d[coo.row] * d[coo.col]))
        keep = np.abs(coo.data) >= theta * scale
        S = sp.coo_matrix(
            (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=(n, n)
        ).tocsr()
    S.setdiag(0.0)
    S.eliminate_zeros()
    # symmetrize (strength may be asymmetric after filtering)
    S = S.maximum(S.T).tocsr()
    return S


def aggregate(S) -> Tuple[np.ndarray, int]:
    """Greedy Vanek aggregation. S: symmetric CSR strength graph with
    zero diagonal. Returns (agg[node] -> aggregate id, count).

    Uses the native C++ three-phase Vanek pass (native/
    tpufem_native.cpp:amg_aggregate — the hypre-coarsening role,
    FEniCSx/...cc:720-813) when the library builds; otherwise the
    vectorized NumPy rounds of independent-set seeding +
    strongest-neighbor attachment below."""
    from tpufem import native

    res = native.amg_aggregate(S.indptr, S.indices, S.data)
    if res is not None:
        return res
    n = S.shape[0]
    indptr, indices, data = S.indptr, S.indices, S.data
    deg = np.diff(indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = indices.astype(np.int64)

    agg = np.full(n, -1, dtype=np.int64)
    n_agg = 0
    for _ in range(200):  # safety bound; converges in a handful of rounds
        un = agg < 0
        if not un.any():
            break
        # nodes with at least one aggregated neighbor
        has_aggd = np.zeros(n, dtype=bool)
        e_to_aggd = agg[cols] >= 0
        has_aggd[rows[e_to_aggd]] = True
        cand = un & ~has_aggd
        if cand.any():
            # deterministic independent set: drop the larger endpoint of
            # every candidate-candidate edge
            sel = cand.copy()
            both = cand[rows] & cand[cols]
            sel[rows[both & (cols < rows)]] = False
            # seed aggregates: seed + its unaggregated neighbors
            seeds = np.nonzero(sel)[0]
            ids = np.arange(len(seeds), dtype=np.int64) + n_agg
            agg[seeds] = ids
            seed_id = np.full(n, -1, dtype=np.int64)
            seed_id[seeds] = ids
            # edges from a seed to an unaggregated node: first seed wins
            e = (seed_id[rows] >= 0) & (agg[cols] < 0)
            if e.any():
                tgt = cols[e]
                src = seed_id[rows[e]]
                order = np.lexsort((src, tgt))
                tgt, src = tgt[order], src[order]
                first = np.ones(len(tgt), dtype=bool)
                first[1:] = tgt[1:] != tgt[:-1]
                agg[tgt[first]] = src[first]
            n_agg += len(seeds)
        else:
            # attach round: join the strongest aggregated neighbor
            e = un[rows] & (agg[cols] >= 0)
            src, tgt, w = rows[e], agg[cols[e]], data[e]
            order = np.lexsort((-w, src))
            src, tgt = src[order], tgt[order]
            first = np.ones(len(src), dtype=bool)
            first[1:] = src[1:] != src[:-1]
            agg[src[first]] = tgt[first]
    assert (agg >= 0).all(), "aggregation did not cover all nodes"
    return agg, n_agg


def _tentative_prolongator(agg: np.ndarray, n_agg: int, B: np.ndarray,
                           bs: int):
    """P_t (n_dofs x n_agg*k) from per-aggregate QR of the near-nullspace.

    Within each aggregate a, P_t[dofs(a), a*k:(a+1)*k] = Q where
    B[dofs(a)] = Q R; the coarse-level nullspace rows become R."""
    import scipy.sparse as sp

    n_dofs, k = B.shape
    nc = n_agg * k
    order = np.argsort(agg, kind="stable")
    counts = np.bincount(agg, minlength=n_agg)
    starts = np.zeros(n_agg + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    Bc = np.zeros((nc, k))
    P_rows = np.empty(n_dofs * k, dtype=np.int64)
    P_cols = np.empty(n_dofs * k, dtype=np.int64)
    P_vals = np.empty(n_dofs * k)
    nnz = 0
    # batch aggregates by size so the QR runs stacked
    for size in np.unique(counts):
        if size == 0:
            continue
        which = np.nonzero(counts == size)[0]
        # (m, size) node ids per aggregate
        nodes = order[starts[which][:, None] + np.arange(size)[None, :]]
        # (m, size*bs) dof ids (byVDIM)
        dofs = (nodes[:, :, None] * bs + np.arange(bs)[None, None, :]).reshape(
            len(which), size * bs
        )
        Bloc = B[dofs]  # (m, size*bs, k)
        Q, R = np.linalg.qr(Bloc)  # Q: (m, d, r), R: (m, r, k), r=min(d,k)
        r = Q.shape[2]
        # scrub near-zero columns (rank-deficient aggregates, e.g. a
        # fully-Dirichlet aggregate whose B rows were zeroed)
        col_norm = np.abs(R[:, np.arange(r), np.arange(r)])
        dead = col_norm < 1e-12
        Q = np.where(dead[:, None, :], 0.0, Q)
        Rz = np.where(dead[:, :, None], 0.0, R)
        Bc[(which[:, None] * k + np.arange(r)[None, :]).ravel()] = Rz.reshape(
            -1, k
        )
        m, d = dofs.shape
        rr = np.broadcast_to(dofs[:, :, None], (m, d, r))
        cc = np.broadcast_to(
            (which[:, None] * k + np.arange(r)[None, :])[:, None, :], (m, d, r)
        )
        cnt = m * d * r
        P_rows[nnz : nnz + cnt] = rr.ravel()
        P_cols[nnz : nnz + cnt] = cc.ravel()
        P_vals[nnz : nnz + cnt] = Q.ravel()
        nnz += cnt
    P = sp.coo_matrix(
        (P_vals[:nnz], (P_rows[:nnz], P_cols[:nnz])), shape=(n_dofs, nc)
    ).tocsr()
    P.eliminate_zeros()
    return P, Bc


def _power_lambda_max(A, inv_d: np.ndarray, iters: int = 25) -> float:
    """lambda_max(D^-1 A) by deterministic power iteration (host)."""
    n = A.shape[0]
    v = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = inv_d * (A @ v)
        nw = np.linalg.norm(w)
        if nw == 0.0:
            return 1.0
        lam = float(v @ w)
        v = w / nw
    return max(lam, 1e-30)


def _csr_to_ell(A) -> Tuple[np.ndarray, np.ndarray]:
    """CSR -> padded ELL in the (width, n_rows) rows-minor layout used by
    EllMatrix (pad col 0 / val 0)."""
    n = A.shape[0]
    counts = np.diff(A.indptr)
    w = int(counts.max()) if len(counts) and counts.max() > 0 else 1
    cols = np.zeros((n, w), dtype=INDEX_DTYPE)
    vals = np.zeros((n, w), dtype=A.data.dtype if A.nnz else np.float64)
    rows_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    within = np.arange(A.nnz, dtype=np.int64) - np.repeat(
        A.indptr[:-1].astype(np.int64), counts
    )
    cols[rows_of, within] = A.indices
    vals[rows_of, within] = A.data
    return np.ascontiguousarray(cols.T), np.ascontiguousarray(vals.T)


class AMGLevel(NamedTuple):
    a_cols: jnp.ndarray  # (wA, n)   level operator, ELL
    a_vals: jnp.ndarray
    inv_d: jnp.ndarray  # (n,)      1/diag (guarded)
    p_cols: jnp.ndarray  # (wP, n)   prolongator rows (indexes coarse vec)
    p_vals: jnp.ndarray
    r_cols: jnp.ndarray  # (wR, nc)  restriction rows (indexes fine vec)
    r_vals: jnp.ndarray
    lmax: jnp.ndarray  # ()        lambda_max(D^-1 A) estimate


class AMGHierarchy(NamedTuple):
    levels: Tuple[AMGLevel, ...]
    coarse_inv: jnp.ndarray  # (nc, nc) dense pseudo-inverse

    @property
    def n_levels(self) -> int:
        return len(self.levels) + 1


def build_hierarchy(
    A,
    coords: np.ndarray,
    bs: int,
    *,
    free_mask: Optional[np.ndarray] = None,
    B: Optional[np.ndarray] = None,
    opts: Optional[AMGOptions] = None,
    dtype=None,
) -> AMGHierarchy:
    """Host-side SA-AMG setup from a SciPy sparse matrix.

    A: (n, n) SPD fine operator (Dirichlet rows/cols already eliminated
    to identity, as Assembler.matrix produces). coords: (n_nodes, gdim)
    node coordinates for the RBMs. free_mask: per *scalar dof* 1/0 free
    mask (bc dofs zeroed out of the nullspace).
    """
    import scipy.sparse as sp

    opts = opts or AMGOptions()
    A = sp.csr_matrix(A)
    n = A.shape[0]
    if B is None:
        fm = None
        if free_mask is not None:
            fm = np.asarray(free_mask, dtype=np.float64)
        B = rigid_body_modes(np.asarray(coords), bs, fm)

    levels = []
    level_bs = bs
    theta = opts.theta
    while (
        A.shape[0] > opts.coarse_size and len(levels) < opts.max_levels - 1
    ):
        diag = A.diagonal()
        inv_d = np.where(diag != 0.0, 1.0 / np.where(diag == 0.0, 1.0, diag), 1.0)
        S = _node_strength_graph(A, level_bs, theta)
        agg, n_agg = aggregate(S)
        if n_agg * B.shape[1] >= A.shape[0]:
            break  # no coarsening achieved; stop here
        Pt, Bc = _tentative_prolongator(agg, n_agg, B, level_bs)
        lmax = _power_lambda_max(A, inv_d)
        # Jacobi-smoothed prolongator: P = (I - omega D^-1 A) P_t
        omega = opts.smooth_omega / lmax
        Dinv = sp.diags(inv_d)
        P = (Pt - omega * (Dinv @ (A @ Pt))).tocsr()
        P.eliminate_zeros()
        R = P.T.tocsr()
        Ac = (R @ A @ P).tocsr()
        Ac.sum_duplicates()

        a_cols, a_vals = _csr_to_ell(A)
        p_cols, p_vals = _csr_to_ell(P)
        r_cols, r_vals = _csr_to_ell(R)
        cast = (lambda x: x) if dtype is None else (lambda x: x.astype(dtype))
        levels.append(
            AMGLevel(
                a_cols=jnp.asarray(a_cols),
                a_vals=jnp.asarray(cast(a_vals)),
                inv_d=jnp.asarray(cast(inv_d)),
                p_cols=jnp.asarray(p_cols),
                p_vals=jnp.asarray(cast(p_vals)),
                r_cols=jnp.asarray(r_cols),
                r_vals=jnp.asarray(cast(r_vals)),
                lmax=jnp.asarray(cast(np.asarray(lmax))),
            )
        )
        A = Ac
        B = Bc
        # coarse levels: one "node" per aggregate, block size = k
        level_bs = B.shape[1]
        theta = theta * 0.5

    Ad = A.toarray()
    # guard exactly-zero rows (dead coarse dofs from rank-deficient
    # aggregates) so the dense solve stays well-posed
    zero_rows = np.abs(Ad).sum(axis=1) == 0.0
    Ad[zero_rows, zero_rows] = 1.0
    coarse_inv = np.linalg.pinv(Ad, rcond=1e-12, hermitian=True)
    cast = (lambda x: x) if dtype is None else (lambda x: x.astype(dtype))
    return AMGHierarchy(
        levels=tuple(levels), coarse_inv=jnp.asarray(cast(coarse_inv))
    )


# =============================================================================
# device-side apply
# =============================================================================


def _ell_mv(cols, vals, x):
    return jnp.sum(vals * x[cols], axis=0)


def _cheb_smooth(cols, vals, inv_d, lmax, b, x, *, degree, lmin_ratio,
                 lmax_scale):
    from tpufem.la.precond import chebyshev_iterate

    return chebyshev_iterate(
        lambda v: _ell_mv(cols, vals, v), inv_d, lmax, b, x,
        degree=degree, lmin_ratio=lmin_ratio, lmax_scale=lmax_scale,
    )


def vcycle(hier: AMGHierarchy, b: jnp.ndarray, *, degree: int = 2,
           lmin_ratio: float = 1.0 / 30.0,
           lmax_scale: float = 1.1) -> jnp.ndarray:
    """One symmetric V(degree,degree)-cycle; pure jnp, unrolled levels."""

    def level(i, b):
        if i == len(hier.levels):
            return hier.coarse_inv @ b
        L = hier.levels[i]
        kw = dict(degree=degree, lmin_ratio=lmin_ratio,
                  lmax_scale=lmax_scale)
        x = _cheb_smooth(
            L.a_cols, L.a_vals, L.inv_d, L.lmax, b, jnp.zeros_like(b), **kw
        )
        res = b - _ell_mv(L.a_cols, L.a_vals, x)
        bc = _ell_mv(L.r_cols, L.r_vals, res)
        xc = level(i + 1, bc)
        x = x + _ell_mv(L.p_cols, L.p_vals, xc)
        return _cheb_smooth(
            L.a_cols, L.a_vals, L.inv_d, L.lmax, b, x, **kw
        )

    return level(0, b)


def amg_preconditioner(hier: AMGHierarchy, *, degree: int = 2,
                       lmin_ratio: float = 1.0 / 30.0,
                       lmax_scale: float = 1.1) -> Callable:
    """M(r) ~= A^-1 r as one V-cycle (SPD; safe inside plain CG)."""

    def M(r):
        return vcycle(
            hier, r, degree=degree, lmin_ratio=lmin_ratio,
            lmax_scale=lmax_scale,
        )

    return M


def ell_to_scipy(mat) -> "object":
    """EllMatrix -> SciPy CSR (host)."""
    import scipy.sparse as sp

    cols = np.asarray(mat.cols)  # (w, n)
    vals = np.asarray(mat.vals)
    w, n = cols.shape
    rows = np.broadcast_to(np.arange(n, dtype=np.int64)[None, :], (w, n))
    A = sp.coo_matrix(
        (vals.ravel(), (rows.ravel(), cols.ravel())), shape=(n, n)
    ).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    return A
