"""Assembler: jitted residual / Jacobian / tangent-action for a functional.

Maps the reference's assembly contract (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:816-867) onto JAX:

- ``residual``        ↔ fem::assemble_vector over ffcx vector kernels (:825)
- ``matrix``          ↔ fem::assemble_matrix + set_diagonal (:852-859)
- ``tangent_action``  ↔ matrix-free J·v (what MFEM's GetGradient + Mult
                        compute without ever forming sparse J)
- ``apply_lifting`` / ``set_bc`` ↔ the identity-row Dirichlet method
  (doc.tex:1670-1741): b ← b − scale·J·(g − x0) on interior rows, then
  b[bc] = scale·(g − x0[bc]); J rows/cols zeroed with unit diagonal.

All element kernels come from jax.grad / jax.hessian / jax.jvp of the
single element-energy function (see tpufem.forms.form). Scatter is a
sorted segment-sum, deterministic by construction (no MatAssembly
epochs, no insert-vs-add modes).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.assemble.pattern import EllMatrix, SparsityPattern
from tpufem.assemble.scatter import GatherSumPlan
from tpufem.forms.form import EnergyFunctional
from tpufem.spaces.bc import DirichletBC, combine_bcs


def _map_cell_slabs(fn, args, batch):
    """Evaluate a cells-minor batched kernel slab-by-slab.

    ``args`` is a pytree of cells-minor arrays ``(..., nc)``; ``fn`` maps a
    slab pytree ``(..., batch)`` to outputs ``(..., batch)``. Cells are
    padded (repeating the last cell) to a multiple of ``batch``, reshaped to
    ``(n_slabs, ..., batch)``, and scanned with ``lax.map`` so XLA's
    rematerialized temporaries are bounded by one slab instead of the whole
    mesh — at millions of cells the monolithic fusion's padded HLO temps
    (e.g. f32[8,nc,2,3] tiled T(2,128): 42x padding) exceed HBM.
    Each slab keeps cells in the minor dim, so per-slab tiling is identical
    to the monolithic kernel's.
    """
    leaves = jax.tree_util.tree_leaves(args)
    nc = leaves[0].shape[-1]

    # prep/unprep run under jit: called eagerly, the pad slice/concat on
    # a (small, small, nc) f64 array compiles a standalone program whose
    # argument copy is tiled on the two SMALL dims — 42x padding, 11.8G
    # at 6.2M cells (observed OOM in the polycrystal postprocess). Under
    # jit the whole prep fuses with XLA-chosen compact layouts.
    xs = _slab_prep(args, batch)
    ys = jax.lax.map(fn, xs)
    return _slab_unprep(ys, nc)


@functools.partial(jax.jit, static_argnames=("batch",))
def _slab_prep(args, batch):
    nc = jax.tree_util.tree_leaves(args)[0].shape[-1]
    pad = (-nc) % batch

    def to_slabs(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.repeat(a[..., -1:], pad, axis=-1)], axis=-1
            )
        a = a.reshape(a.shape[:-1] + (-1, batch))
        return jnp.moveaxis(a, -2, 0)

    return jax.tree_util.tree_map(to_slabs, args)


@functools.partial(jax.jit, static_argnames=("nc",))
def _slab_unprep(ys, nc):
    def from_slabs(y):
        y = jnp.moveaxis(y, 0, -2)
        return y.reshape(y.shape[:-2] + (-1,))[..., :nc]

    return jax.tree_util.tree_map(from_slabs, ys)


class Assembler:
    def __init__(self, functional: EnergyFunctional,
                 bcs: Sequence[DirichletBC] = ()):
        self.functional = functional
        self.space = functional.space
        self.n_dofs = self.space.n_dofs
        self._energy_fn = functional.element_energy_fn()
        self._facet_fns = functional.facet_energy_fns()

        # residual reduction plan: gather-based (TPU scatters serialize).
        # Element outputs are cells-minor (nd, nc): flat source index of
        # entry (cell, slot) is slot*nc + cell → build from dm.T.
        dm = np.asarray(functional.vec_dofmap)
        self._r_plan = GatherSumPlan.build(dm.T.ravel(), self.n_dofs)

        # BCs
        self.bcs = list(bcs)
        if self.bcs:
            bc_dofs, bc_vals, bc_mask = combine_bcs(self.bcs, self.n_dofs)
        else:
            bc_dofs = np.zeros(0, dtype=np.int32)
            bc_vals = np.zeros(0)
            bc_mask = np.zeros(self.n_dofs, dtype=bool)
        self.bc_dofs = jnp.asarray(bc_dofs)
        self.bc_vals_np = bc_vals
        self._free_mask_np = ~bc_mask
        # device-resident copies (pytree leaves — never trace-time consts)
        self._bc_vals_dev = jnp.asarray(bc_vals)
        self._free_dev = jnp.asarray((~bc_mask).astype(np.float64))

        # sparsity (lazy; call .pattern before jit-tracing matrix())
        self._pattern: Optional[SparsityPattern] = None
        self._nnz_plan: Optional[GatherSumPlan] = None
        self._ell_slots_T = None
        self._ell_cols_T = None
        self._pat_rows = None
        self._pat_cols = None
        self._facet_mat_slots = []

    # -- helpers -------------------------------------------------------------

    def bc_values(self, dtype) -> jnp.ndarray:
        return self._bc_vals_dev.astype(dtype)

    def free_mask(self, dtype) -> jnp.ndarray:
        """1.0 on unconstrained dofs, 0.0 on Dirichlet dofs."""
        return self._free_dev.astype(dtype)

    @property
    def pattern(self) -> SparsityPattern:
        if self._pattern is None:
            self._pattern = SparsityPattern.from_dofmap(
                np.asarray(self.functional.vec_dofmap), self.n_dofs
            )
            # gather plan: element-matrix entry → nnz slot, for the
            # cells-minor (nd, nd, nc) layout: flat source of (c, i, j)
            # is (i*nd + j)*nc + c
            pat = self._pattern
            entry_slots = np.empty(len(pat.perm), dtype=np.int64)
            entry_slots[np.asarray(pat.perm)] = np.asarray(pat.sorted_slots)
            nc, nd = np.asarray(self.functional.vec_dofmap).shape
            slots_T = entry_slots.reshape(nc, nd * nd).T.ravel()
            self._nnz_plan = GatherSumPlan.build(slots_T, pat.nnz)
            # device-resident ELL tables (rows-minor)
            self._ell_slots_T = jnp.asarray(
                np.ascontiguousarray(pat.ell_slots.T)
            )
            self._ell_cols_T = jnp.asarray(
                np.ascontiguousarray(pat.ell_cols.T)
            )
            self._pat_rows = jnp.asarray(pat.rows)
            self._pat_cols = jnp.asarray(pat.cols)
            # facet-term Hessian slots: (facet, i, j) -> nnz slot. All
            # facet dofs share the facet's owner cell, so every pair is
            # in the cell sparsity; located by searchsorted on the
            # sorted (row, col) keys. Makes the ASSEMBLED Jacobian
            # exact for nonlinear facet energies (the reference's J is
            # ufl.derivative of the FULL form incl. the ds term,
            # asym_ufl.py:83); matrix-free tangent_action was already
            # exact via JVP.
            self._facet_mat_slots = []
            if self._facet_fns:
                rows = np.asarray(pat.rows, dtype=np.int64)
                cols = np.asarray(pat.cols, dtype=np.int64)
                key = rows * np.int64(self.n_dofs) + cols
                order = np.argsort(key, kind="stable")
                key_s = key[order]
                for _fn, dofmap, _x, _n in self._facet_fns:
                    dm = np.asarray(dofmap, dtype=np.int64)  # (nf, ndf)
                    pk = (dm[:, :, None] * np.int64(self.n_dofs)
                          + dm[:, None, :])
                    pos = np.searchsorted(key_s, pk)
                    assert (pos < len(key_s)).all() and (
                        key_s[pos] == pk
                    ).all(), "facet dof pair missing from sparsity"
                    self._facet_mat_slots.append(
                        jnp.asarray(order[pos].astype(np.int64))
                    )
        return self._pattern

    # -- element-level batched kernels ----------------------------------------

    def element_vectors(self, u, coeffs: Dict[str, jnp.ndarray],
                        batch: Optional[int] = None):
        """(ndofe, nc) element residual vectors = ∂Πe/∂u_e (the ffcx
        'tabulate_tensor vector kernel' analog), cells-minor layout.

        ``batch``: evaluate in cell slabs of this size (bounds HBM temps
        at multi-million-cell scale); None = one fused kernel."""
        u_cells = self.functional.gather(u)
        c_cells = self.functional.gather_coeffs(coeffs)
        x_cells = self.functional.x_cells.astype(u.dtype)
        g = jax.vmap(jax.grad(self._energy_fn), in_axes=(-1, -1, -1),
                     out_axes=-1)
        if not batch or u_cells.shape[-1] <= batch:
            return g(u_cells, x_cells, c_cells)
        return _map_cell_slabs(
            lambda a: g(*a), (u_cells, x_cells, c_cells), batch
        )

    def element_matrices(self, u, coeffs: Dict[str, jnp.ndarray],
                         batch: Optional[int] = None):
        """(ndofe, ndofe, nc) consistent element tangents = ∂²Πe/∂u_e²
        — replaces the nested-dual Hessian of admfem.hpp:672-699 and the
        hand-derived d(ψ)/dΛ tangents of MFEM/...cc:766-871.

        ``batch``: evaluate in cell slabs (the Hessian temporaries are
        ndofe× larger than the residual's, so multi-million-cell meshes
        need this even sooner)."""
        u_cells = self.functional.gather(u)
        c_cells = self.functional.gather_coeffs(coeffs)
        x_cells = self.functional.x_cells.astype(u.dtype)
        h = jax.vmap(jax.hessian(self._energy_fn), in_axes=(-1, -1, -1),
                     out_axes=-1)
        if not batch or u_cells.shape[-1] <= batch:
            return h(u_cells, x_cells, c_cells)
        return _map_cell_slabs(
            lambda a: h(*a), (u_cells, x_cells, c_cells), batch
        )

    # -- global assembly -------------------------------------------------------

    def energy(self, u, coeffs, batch: Optional[int] = None) -> jnp.ndarray:
        """Total potential Π(u) (useful for validation/line search)."""
        u_cells = self.functional.gather(u)
        c_cells = self.functional.gather_coeffs(coeffs)
        x_cells = self.functional.x_cells.astype(u.dtype)
        e_fn = jax.vmap(self._energy_fn, in_axes=(-1, -1, -1))
        if not batch or u_cells.shape[-1] <= batch:
            e = e_fn(u_cells, x_cells, c_cells)
        else:
            # per-cell energies come back (nc,) cells-minor via the slab
            # map (out shape (batch,) per slab); padded cells are sliced
            # off before the sum, so duplicates don't contribute
            e = _map_cell_slabs(
                lambda a: e_fn(*a), (u_cells, x_cells, c_cells), batch
            )
        total = jnp.sum(e)
        for fn, dofmap, x_f, nrm in self._facet_fns:
            fe = jax.vmap(fn, in_axes=(0, 0, 0))(
                u[dofmap], x_f.astype(u.dtype), nrm.astype(u.dtype)
            )
            total = total + jnp.sum(fe)
        return total

    def residual(self, u, coeffs,
                 batch: Optional[int] = None) -> jnp.ndarray:
        """Assembled residual F(u) (no BC treatment)."""
        ev = self.element_vectors(u, coeffs, batch=batch)
        r = self._r_plan.apply(ev)
        for fn, dofmap, x_f, nrm in self._facet_fns:
            fv = jax.vmap(jax.grad(fn), in_axes=(0, 0, 0))(
                u[dofmap], x_f.astype(u.dtype), nrm.astype(u.dtype)
            )
            r = r.at[dofmap.ravel()].add(fv.ravel())
        return r

    def tangent_action(self, u, coeffs, v) -> jnp.ndarray:
        """Matrix-free J(u)·v via jvp of the assembled residual."""
        f = lambda w: self.residual(w, coeffs)
        return jax.jvp(f, (u,), (v,))[1]

    def matrix(self, u, coeffs,
               batch: Optional[int] = None) -> EllMatrix:
        """Assembled sparse Jacobian in ELL form, with Dirichlet rows
        zeroed and unit diagonal (assemble_matrix + set_diagonal
        semantics, FEniCSx/...cc:852-857). Columns for bc dofs are also
        zeroed (symmetric elimination) so CG keeps a SPD operator; the
        missing column contribution is restored by apply_lifting."""
        pat = self.pattern
        em = self.element_matrices(u, coeffs, batch=batch)
        nnz_vals = self._nnz_plan.apply(em)
        # facet-term Hessians (exact consistent tangent for nonlinear
        # facet energies; zero rows for the reference's linear tractions)
        for (fn, dofmap, x_f, nrm), slots in zip(
            self._facet_fns, self._facet_mat_slots
        ):
            fh = jax.vmap(jax.hessian(fn), in_axes=(0, 0, 0))(
                u[dofmap], x_f.astype(u.dtype), nrm.astype(u.dtype)
            )  # (nf, ndf, ndf)
            nnz_vals = nnz_vals.at[slots.ravel()].add(fh.ravel())
        rows = self._pat_rows
        cols = self._pat_cols
        if len(self.bc_dofs):
            free = self.free_mask(nnz_vals.dtype)
            keep = free[rows] * free[cols]
            diag = (rows == cols) & (free[rows] == 0.0)
            nnz_vals = nnz_vals * keep + jnp.where(diag, 1.0, 0.0)
        # scatter nnz slots into padded ELL layout (rows-minor)
        padded = jnp.concatenate(
            [nnz_vals, jnp.zeros(1, dtype=nnz_vals.dtype)]
        )
        ell_vals = padded[self._ell_slots_T]
        return EllMatrix(
            n_rows=pat.n_rows, cols=self._ell_cols_T, vals=ell_vals
        )

    def diagonal(self, u, coeffs) -> jnp.ndarray:
        """Jacobian diagonal (for Jacobi/Chebyshev PC) without forming the
        matrix: element Hessian diagonals scattered; 1.0 on bc dofs."""
        em = self.element_matrices(u, coeffs)
        ed = jnp.diagonal(em, axis1=0, axis2=1).T  # (ndofe, nc)
        diag = self._r_plan.apply(ed)
        for fn, dofmap, x_f, nrm in self._facet_fns:
            fh = jax.vmap(
                lambda ue, xe, ne: jnp.diagonal(
                    jax.hessian(fn)(ue, xe, ne)
                ),
                in_axes=(0, 0, 0),
            )(u[dofmap], x_f.astype(u.dtype), nrm.astype(u.dtype))
            diag = diag.at[dofmap.ravel()].add(fh.ravel())
        if len(self.bc_dofs):
            free = self.free_mask(diag.dtype)
            diag = diag * free + (1.0 - free)
        return diag

    # -- Dirichlet application (dolfinx contract) -------------------------------

    def lifted_rhs(self, u, coeffs, r=None):
        """Newton right-hand side with Dirichlet lifting.

        Builds b such that solving Â δ = b (with Â = M J M + (I−M), M the
        free-dof projector) yields the constrained Newton step:
        b_free = −r − J·w, b_bc = w, where w[bc] = g − u[bc] (zero
        elsewhere). This is apply_lifting(b,{J},{bc},{u},-1) + set_bc
        (FEniCSx/...cc:825-836) expressed matrix-free.
        """
        if r is None:
            r = self.residual(u, coeffs)
        free = self.free_mask(u.dtype)
        w = jnp.zeros_like(u)
        if len(self.bc_dofs):
            w = w.at[self.bc_dofs].set(self.bc_values(u.dtype) - u[self.bc_dofs])
        Jw = self.tangent_action(u, coeffs, w)
        b = (-r - Jw) * free + w
        return b

    def constrained_action(self, u, coeffs):
        """Returns v ↦ Â v = M J M v + (I−M) v (SPD if J is)."""
        free = self.free_mask(u.dtype)

        def op(v):
            Jv = self.tangent_action(u, coeffs, v * free)
            return Jv * free + v * (1.0 - free)

        return op

    def constrained_matvec(self, mat: EllMatrix):
        """Same constrained operator from an assembled matrix."""

        def op(v):
            return mat.matvec(v)

        return op

    def set_bc(self, u) -> jnp.ndarray:
        """u with Dirichlet values imposed (dolfinx set_bc on a solution
        vector)."""
        if not len(self.bc_dofs):
            return u
        return u.at[self.bc_dofs].set(self.bc_values(u.dtype))


from tpufem.utils.pytree import register_pytree_with_leaves

# note: _facet_fns (closures over small facet arrays) stays in aux — the
# facet tables are tiny; only bulk per-cell/per-dof tables need to be
# argument leaves.
register_pytree_with_leaves(
    Assembler,
    [
        "functional", "_r_plan", "_nnz_plan", "bc_dofs",
        "_bc_vals_dev", "_free_dev", "_ell_slots_T", "_ell_cols_T",
        "_pat_rows", "_pat_cols",
    ],
)
