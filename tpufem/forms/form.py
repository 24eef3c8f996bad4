"""EnergyFunctional: compile an energy density into element kernels.

The TPU-native analog of the ffcx compile pipeline (SURVEY.md §3.4):
where the reference runs ``ffcx asym_*.py`` at build time to emit C
``tabulate_tensor`` kernels (FEniCSx/mechanic2d/Makefile:13-15), we trace
a Python element-energy function once under ``jax.jit``; ``jax.grad`` of
it is the element residual kernel (the ffcx "vector kernel"),
``jax.hessian`` the element matrix kernel (the "matrix kernel"), and
``jax.jvp`` of the gradient the matrix-free tangent action. XLA fuses the
quadrature loop, the geometry map, and the constitutive law into one
batched kernel over all cells (vmap).

Element dof values arrive as (ndof, bs) blocks; coefficients are
evaluated at quadrature points from their own (possibly different-degree)
spaces, mirroring the coefficient packing dolfinx does per form
(FEniCSx/...cc:672-675).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.elements.geometry import det as small_det, inv as small_inv
from tpufem.elements.lagrange import element as make_element
from tpufem.elements.quadrature import quadrature
from tpufem.spaces.space import FunctionSpace


@dataclasses.dataclass(frozen=True)
class Coefficient:
    """A field entering the integrand, with its own space."""

    name: str
    space: FunctionSpace  # space the coefficient lives in


class QP:
    """Per-quadrature-point context handed to integrands."""

    def __init__(self, grad_u, u, x, coeffs, coeff_grads):
        self.grad_u = grad_u  # (bs, gdim) physical gradient of u
        self.u = u  # (bs,) value of u
        self.x = x  # (gdim,) physical position
        self._c = coeffs  # name -> value ((,) scalar or (bs_c,))
        self._cg = coeff_grads  # name -> (bs_c, gdim) if requested

    @property
    def eps(self):
        """Symmetric gradient (small strain), (bs, gdim)."""
        return 0.5 * (self.grad_u + self.grad_u.T)

    def coeff(self, name):
        return self._c[name]

    def coeff_grad(self, name):
        return self._cg[name]


@dataclasses.dataclass(frozen=True)
class Term:
    """∫ integrand(qp) dX over all cells, at given quadrature degree.

    The reference forces degree 1 on the stiffness term and the default
    degree on the load term (asym_ufl.py:78-81); one Term each.
    """

    integrand: Callable[[QP], jnp.ndarray]
    degree: int
    needs_coeff_grads: Sequence[str] = ()


class FacetQP:
    """Per-quadrature-point context on an exterior facet."""

    def __init__(self, u, x, normal, coeffs):
        self.u = u  # (bs,) value of u at the point
        self.x = x  # (gdim,) position
        self.normal = normal  # (gdim,) outward unit normal
        self._c = coeffs

    def coeff(self, name):
        return self._c[name]


@dataclasses.dataclass(frozen=True)
class FacetTerm:
    """∫ integrand(fqp) dΓ over a set of exterior facets.

    Equivalent of the reference's ``ds(0)`` surface-load term and its
    exterior_facet subdomain machinery (USE_SURF,
    FEniCSx/mechanic2d/asym_elasto_damage_model.cc:589-608; the traction
    ``dot(t*n, delta_u)*ds(0)`` sketched at asym_ufl.py:74-81). The energy
    form of a traction t is −∫ t·u dΓ.
    """

    integrand: Callable[[FacetQP], jnp.ndarray]
    degree: int
    facets: np.ndarray  # indices into the mesh facet table


def _scalar_det_inv(J):
    """det + inverse of a small square matrix given as nested lists of
    traced scalars (closed-form adjugate; no linalg, no arrays).
    J indexed [row][col]; returns (det, inv) with inv[i][j]."""
    n = len(J)
    if n == 1:
        det = J[0][0]
        return det, [[1.0 / det]]
    if n == 2:
        a, b = J[0]
        c, d = J[1]
        det = a * d - b * c
        r = 1.0 / det
        return det, [[d * r, -b * r], [-c * r, a * r]]
    if n == 3:
        a, b, c = J[0]
        d, e, f = J[1]
        g, h, i = J[2]
        A = e * i - f * h
        B = f * g - d * i
        C = d * h - e * g
        det = a * A + b * B + c * C
        r = 1.0 / det
        return det, [
            [A * r, (c * h - b * i) * r, (b * f - c * e) * r],
            [B * r, (a * i - c * g) * r, (c * d - a * f) * r],
            [C * r, (b * g - a * h) * r, (a * e - b * d) * r],
        ]
    raise NotImplementedError(f"{n}x{n} geometry Jacobian")


class EnergyFunctional:
    """Π(u) = Σ_terms ∫ integrand dX; residual F = ∂Π/∂u, Jacobian ∂²Π/∂u².

    Equivalent of the (F, J=derivative(F)) form pair created at
    FEniCSx/...cc:679-685, for hyperelastic-type F (F = DΠ).
    """

    def __init__(
        self,
        space: FunctionSpace,
        terms: Sequence[Term],
        coefficients: Sequence[Coefficient] = (),
        facet_terms: Sequence[FacetTerm] = (),
    ):
        self.space = space
        self.terms = list(terms)
        self.facet_terms = list(facet_terms)
        self.coefficients = list(coefficients)
        mesh = space.mesh
        self.geom_element = make_element(mesh.cell_type, 1)
        # static per-cell geometry (host → device once).
        # LAYOUT: cells in the MINOR (last) dimension — on TPU the minor
        # dim maps to the 128 vector lanes, so per-cell scalars tile
        # densely; a (nc, 6) layout would waste 122/128 lanes per tile.
        from tpufem.utils.hostops import cells_minor_coords

        self._x_cells = jnp.asarray(
            cells_minor_coords(mesh.x, mesh.cells)
        )  # (nvg, gdim, nc)
        vdm = space.vector_dofmap()
        self._vec_dofmap = vdm  # (nc, ndof*bs) host-side (plan building)
        self._vec_dofmap_T = jnp.asarray(
            np.ascontiguousarray(vdm.T)
        )  # (ndof*bs, nc) — gather directly into cells-minor layout
        self._coeff_dofmaps_T = {
            c.name: jnp.asarray(
                np.ascontiguousarray(c.space.vector_dofmap().T)
            )
            for c in self.coefficients
        }
        # tabulations per term (static constants baked into the trace)
        self._tabs = []
        for t in self.terms:
            qpts, qwts = quadrature(mesh.cell_type, t.degree)
            tab = {
                "qw": qwts,
                "N_geom": self.geom_element.tabulate(qpts),  # (nq, nvg)
                "dN_geom": self.geom_element.tabulate_grad(qpts),  # (nq,nvg,dim)
                "N_u": space.element.tabulate(qpts),  # (nq, ndof)
                "dN_u": space.element.tabulate_grad(qpts),  # (nq, ndof, dim)
                "N_c": {
                    c.name: c.space.element.tabulate(qpts)
                    for c in self.coefficients
                },
                "dN_c": {
                    c.name: c.space.element.tabulate_grad(qpts)
                    for c in self.coefficients
                },
            }
            self._tabs.append(tab)

        # facet-term data: static tabulations + device arrays (separate so
        # the arrays can be pytree leaves — see tpufem.utils.pytree)
        self._facet_static = []
        self._facet_arrays = []
        if self.facet_terms:
            from tpufem.mesh.mesh import CELL_INFO
            from tpufem.mesh.topology import build_entities, facet_to_cells

            facets, _ = build_entities(mesh, mesh.dim - 1)
            indptr, cell_ids = facet_to_cells(mesh)
            facet_type = CELL_INFO[mesh.cell_type]["facet"]
            f_el = make_element(facet_type, 1)
            for ft in self.facet_terms:
                fidx = np.asarray(ft.facets, dtype=np.int64)
                if fidx.size == 0:
                    continue  # term over an empty facet set contributes 0
                fverts = facets[fidx]  # (nf, nvf) vertex indices
                x_f = mesh.x[fverts]  # (nf, nvf, gdim)
                # outward normal per facet from the owning cell centroid
                owner = cell_ids[indptr[fidx]]
                cc = mesh.x[mesh.cells[owner]].mean(axis=1)
                fc = x_f.mean(axis=1)
                if mesh.dim == 2:
                    tang = x_f[:, 1] - x_f[:, 0]
                    nrm = np.stack([tang[:, 1], -tang[:, 0]], axis=1)
                else:
                    nrm = np.cross(
                        x_f[:, 1] - x_f[:, 0], x_f[:, 2] - x_f[:, 0]
                    )
                flip = np.sum(nrm * (fc - cc), axis=1) < 0
                nrm[flip] *= -1.0
                nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
                # facet dofmap (P1/P2 vertex dofs; P2 adds the edge dof)
                fd = fverts.astype(np.int64)
                if space.element.degree == 2 and mesh.dim == 2:
                    from tpufem.mesh.topology import match_tagged_entities  # noqa

                    # the facet IS an edge: edge dof index = n_nodes + edge id
                    fd = np.concatenate(
                        [fd, (mesh.n_nodes + fidx)[:, None]], axis=1
                    )
                    f_el_deg = make_element(facet_type, 2)
                else:
                    f_el_deg = f_el
                fd_vec = (
                    fd[..., None] * space.bs + np.arange(space.bs)
                ).reshape(len(fidx), -1)
                qpts, qwts = quadrature(facet_type, ft.degree)
                self._facet_static.append(
                    dict(
                        term=ft,
                        qw=qwts,
                        N_u=f_el_deg.tabulate(qpts),  # (nq, ndof_f)
                        N_geom=f_el.tabulate(qpts),  # (nq, nvf)
                        dN_geom=f_el.tabulate_grad(qpts),  # (nq, nvf, dim-1)
                    )
                )
                self._facet_arrays.append(
                    (
                        jnp.asarray(fd_vec.astype(np.int64)),
                        jnp.asarray(x_f),
                        jnp.asarray(nrm),
                    )
                )

    # -- element kernels ---------------------------------------------------

    def element_energy_fn(self) -> Callable:
        """Returns fn(u_e (ndof*bs,), x_e (nvg,gdim), coeff_es dict) → scalar.

        This single scalar function is what jax.grad / jax.hessian
        differentiate — the analog of the ffcx-generated tabulate_tensor
        bodies (~260–970 C lines each, doc.tex:2322-2325) for *all*
        variants at once.
        """
        space = self.space
        bs = space.bs
        ndof = space.element.ndof
        terms = self.terms
        tabs = self._tabs
        coeff_bs = {c.name: c.space.bs for c in self.coefficients}
        coeff_ndof = {c.name: c.space.element.ndof for c in self.coefficients}

        def energy(u_e, x_e, coeff_es):
            # full f32 accumulation: TPU matmuls default to bf16 inputs,
            # which costs ~3 digits in assembled residuals
            with jax.default_matmul_precision("float32"):
                return _energy(u_e, x_e, coeff_es)

        def _energy(u_e, x_e, coeff_es):
            u = u_e.reshape(ndof, bs)
            total = jnp.zeros((), dtype=u_e.dtype)
            for t, tab in zip(terms, tabs):
                nq = tab["qw"].shape[0]
                for q in range(nq):  # static unroll; nq is tiny (1–8)
                    dNg = jnp.asarray(tab["dN_geom"][q], dtype=u_e.dtype)
                    J = x_e.T @ dNg  # (gdim, dim)
                    detJ = small_det(J)
                    Jinv = small_inv(J)  # (dim, gdim)
                    dN = jnp.asarray(tab["dN_u"][q], dtype=u_e.dtype) @ Jinv
                    N = jnp.asarray(tab["N_u"][q], dtype=u_e.dtype)
                    Ng = jnp.asarray(tab["N_geom"][q], dtype=u_e.dtype)
                    grad_u = u.T @ dN  # (bs, gdim)
                    u_q = N @ u  # (bs,)
                    x_q = Ng @ x_e  # (gdim,)
                    cvals = {}
                    cgrads = {}
                    for name, ce in coeff_es.items():
                        cb = coeff_bs[name]
                        cv = ce.reshape(coeff_ndof[name], cb)
                        Nc = jnp.asarray(tab["N_c"][name][q], dtype=u_e.dtype)
                        val = Nc @ cv
                        cvals[name] = val[0] if cb == 1 else val
                        if name in t.needs_coeff_grads:
                            dNc = (
                                jnp.asarray(
                                    tab["dN_c"][name][q], dtype=u_e.dtype
                                )
                                @ Jinv
                            )
                            cgrads[name] = cv.T @ dNc
                    qp = QP(grad_u, u_q[0] if bs == 1 else u_q, x_q, cvals, cgrads)
                    w = jnp.asarray(tab["qw"][q], dtype=u_e.dtype)
                    total = total + t.integrand(qp) * w * jnp.abs(detJ)
            return total

        return energy

    def element_energy_fn_elementwise(self) -> Callable:
        """Scalarized variant of :meth:`element_energy_fn`.

        Same math, but every small contraction (J = x_eᵀ dN_geom, J⁻¹,
        reference→physical gradient push, N·u, N_c·c) is unrolled into
        scalar arithmetic with the basis weights as host constants —
        zero entries skipped. Under a cells-minor vmap every
        intermediate is then a single (n_cells,) vector op; the batched
        micro-matmuls of the generic path force XLA relayouts that cost
        ~25x on TPU (measured in the lane engine: 62 ms vs 2.5 ms for
        the same 2.1M-DoF residual). This is the lane engine's generic
        element path for P2/Q1/Q2/3D cells.
        """
        space = self.space
        bs = space.bs
        ndof = space.element.ndof
        gdim = space.mesh.x.shape[1]
        terms = self.terms
        tabs = self._tabs
        coeff_meta = [
            (c.name, c.space.element.ndof, c.space.bs)
            for c in self.coefficients
        ]

        def lin(get, w, zero):
            """Σ_i w[i]·get(i) with host-constant weights, zeros skipped."""
            acc = None
            for i, wi in enumerate(w):
                wi = float(wi)
                if wi == 0.0:
                    continue
                term = get(i) if wi == 1.0 else wi * get(i)
                acc = term if acc is None else acc + term
            return zero if acc is None else acc

        def energy(u_e, x_e, coeff_es):
            u = u_e.reshape(ndof, bs)
            zero = jnp.zeros((), dtype=u_e.dtype)
            total = zero
            for t, tab in zip(terms, tabs):
                nq = tab["qw"].shape[0]
                for q in range(nq):
                    dNg = np.asarray(tab["dN_geom"][q], np.float64)
                    dim = dNg.shape[1]
                    if dim != gdim:
                        raise NotImplementedError(
                            "elementwise path needs volume cells (dim == gdim)"
                        )
                    J = [
                        [
                            lin(lambda v: x_e[v, g], dNg[:, d], zero)
                            for d in range(dim)
                        ]
                        for g in range(gdim)
                    ]
                    detJ, Jinv = _scalar_det_inv(J)
                    # reference gradient of u, then push to physical
                    dNu = np.asarray(tab["dN_u"][q], np.float64)
                    gref = [
                        [lin(lambda v: u[v, c], dNu[:, d], zero)
                         for d in range(dim)]
                        for c in range(bs)
                    ]
                    grad_u = jnp.stack(
                        [
                            jnp.stack(
                                [
                                    sum(gref[c][d] * Jinv[d][g]
                                        for d in range(dim))
                                    for g in range(gdim)
                                ]
                            )
                            for c in range(bs)
                        ]
                    )
                    Nu = np.asarray(tab["N_u"][q], np.float64)
                    u_q = [lin(lambda v: u[v, c], Nu, zero) for c in range(bs)]
                    Ng = np.asarray(tab["N_geom"][q], np.float64)
                    x_q = jnp.stack(
                        [lin(lambda v: x_e[v, g], Ng, zero)
                         for g in range(gdim)]
                    )
                    cvals = {}
                    cgrads = {}
                    for name, ndc, cb in coeff_meta:
                        cv = coeff_es[name].reshape(ndc, cb)
                        Nc = np.asarray(tab["N_c"][name][q], np.float64)
                        vals = [lin(lambda v: cv[v, cc], Nc, zero)
                                for cc in range(cb)]
                        cvals[name] = vals[0] if cb == 1 else jnp.stack(vals)
                        if name in t.needs_coeff_grads:
                            dNc = np.asarray(tab["dN_c"][name][q], np.float64)
                            cgr = [
                                [lin(lambda v: cv[v, cc], dNc[:, d], zero)
                                 for d in range(dim)]
                                for cc in range(cb)
                            ]
                            cgrads[name] = jnp.stack(
                                [
                                    jnp.stack(
                                        [
                                            sum(cgr[cc][d] * Jinv[d][g]
                                                for d in range(dim))
                                            for g in range(gdim)
                                        ]
                                    )
                                    for cc in range(cb)
                                ]
                            )
                    qp = QP(
                        grad_u, u_q[0] if bs == 1 else jnp.stack(u_q),
                        x_q, cvals, cgrads,
                    )
                    w = float(tab["qw"][q])
                    total = total + t.integrand(qp) * (w * jnp.abs(detJ))
            return total

        return energy

    def facet_energy_fns(self):
        """Per facet-term: (energy_fn(u_f, x_f, normal) → scalar, dofmap).

        Coefficient fields on facets are not yet supported — traction
        terms close over constants instead (matches the reference, whose
        surface load is a Constant t, asym_ufl.py:74-75).
        """
        out = []
        bs = self.space.bs
        for blk, arrs in zip(self._facet_static, self._facet_arrays):
            term = blk["term"]
            qw, N_u, dNg = blk["qw"], blk["N_u"], blk["dN_geom"]
            Ng = blk["N_geom"]
            ndof_f = N_u.shape[1]

            def energy(u_f, x_f, nrm, qw=qw, N_u=N_u, dNg=dNg, Ng=Ng,
                       ndof_f=ndof_f, term=term):
                u = u_f.reshape(ndof_f, bs)
                total = jnp.zeros((), dtype=u_f.dtype)
                for q in range(qw.shape[0]):
                    J = x_f.T @ jnp.asarray(dNg[q], dtype=u_f.dtype)
                    # surface measure: |J| column norm (2D edge) or cross
                    # product magnitude (3D facet)
                    if J.shape[1] == 1:
                        ds = jnp.linalg.norm(J[:, 0])
                    else:
                        c = jnp.cross(J[:, 0], J[:, 1])
                        ds = jnp.linalg.norm(c)
                    u_q = jnp.asarray(N_u[q], dtype=u_f.dtype) @ u
                    x_q = jnp.asarray(Ng[q], dtype=u_f.dtype) @ x_f
                    fqp = FacetQP(u_q[0] if bs == 1 else u_q, x_q, nrm, {})
                    total = total + term.integrand(fqp) * jnp.asarray(
                        qw[q], dtype=u_f.dtype
                    ) * ds
                return total

            out.append((energy, arrs[0], arrs[1], arrs[2]))
        return out

    # -- gathered per-cell inputs (cells-minor layout) -----------------------

    def gather(self, u: jnp.ndarray):
        """Per-cell dof blocks for u: (ndof*bs, nc)."""
        return u[self._vec_dofmap_T]

    def gather_coeffs(self, coeff_values: Dict[str, jnp.ndarray]):
        """Per-cell blocks per coefficient: name → (ndof_c*bs_c, nc)."""
        return {
            name: coeff_values[name][dm]
            for name, dm in self._coeff_dofmaps_T.items()
        }

    @property
    def x_cells(self):
        """(nvg, gdim, nc) — cells minor."""
        return self._x_cells

    @property
    def vec_dofmap(self):
        """(nc, ndof*bs) row-major dofmap (host-side plan building)."""
        return self._vec_dofmap


from tpufem.utils.pytree import register_pytree_with_leaves

# Device arrays as pytree leaves so jitted callers can pass the
# functional as an argument instead of closing over it (constants are
# rematerialized per call on the remote TPU path — ~600x slower).
register_pytree_with_leaves(
    EnergyFunctional,
    ["_x_cells", "_vec_dofmap_T", "_coeff_dofmaps_T", "_facet_arrays"],
)
