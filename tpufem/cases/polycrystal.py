"""Synthetic Neper-style polycrystal workload on the unstructured path.

The reference's benchmark mesh is an unstructured Neper polycrystal of
~200 grains (doc.tex:163-187) at ~3.08M nodes / 6.17M displacement dofs
(doc.tex:2336-2337); the actual mesh blobs are stripped from the mount
(.MISSING_LARGE_BLOBS). This module generates a statistically equivalent
workload — a jittered Delaunay triangulation of the unit square with
Voronoi grain tags — writes/reads it through the gmsh 2.2 ingest path,
and solves the same asymmetric elasto-damage problem end-to-end on the
lane-partitioned unstructured engine.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from tpufem.config import INDEX_DTYPE, SolverConfig
from tpufem.mesh.mesh import CellType, Mesh
from tpufem.utils.glibc_rand import GlibcRand


def generate_polycrystal(
    n: int,
    *,
    n_grains: int = 200,
    seed: int = 6575,
    jitter: float = 0.35,
) -> Mesh:
    """Unstructured triangulation of the unit square with grain tags.

    (n+1)^2 nodes on a jittered lattice (boundary nodes stay exact so
    Dirichlet predicates work), Delaunay-triangulated; each cell gets
    the grain tag of the nearest of ``n_grains`` seed points — a Voronoi
    polycrystal. Grain seeds and jitter are reproducible (numpy PCG with
    ``seed``; the per-grain E field later reuses the reference's glibc
    srand(6575) stream keyed by these tags, mechanic2d.young_modulus_range).

    Deterministic in its parameters, so the generated mesh is disk-cached
    when TPUFEM_ARTIFACT_CACHE is set — the analog of the reference
    READING its Neper-generated mesh file rather than generating it
    inside the timed run (doc.tex:163-187; Neper runs offline).
    """
    from scipy.spatial import Delaunay, cKDTree

    from tpufem.utils import artifacts as _art

    ck = None
    if _art.cache_dir() is not None:
        ck = _art.fingerprint("polymesh", n, n_grains, seed, jitter,
                              _art.MESH_CACHE_VERSION)
        b = _art.load_bundle("mesh", ck)
        if b is not None:
            return Mesh(
                x=b["x"], cells=b["cells"],
                cell_type=CellType.triangle, cell_tags=b["cell_tags"],
            )

    rng = np.random.default_rng(seed)
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    h = 1.0 / n
    inner = (
        (pts[:, 0] > 0) & (pts[:, 0] < 1) & (pts[:, 1] > 0) & (pts[:, 1] < 1)
    )
    pts[inner] += rng.uniform(-jitter * h, jitter * h, (inner.sum(), 2))

    tri = Delaunay(pts)
    cells = tri.simplices.astype(INDEX_DTYPE)
    # drop degenerate slivers (qhull can emit near-zero-area cells on
    # cocircular boundary points)
    v = pts[cells]
    area2 = np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1])
    )
    cells = cells[area2 > 1e-14]

    seeds = rng.uniform(0.0, 1.0, (n_grains, 2))
    centroids = pts[cells].mean(axis=1)
    _, grain = cKDTree(seeds).query(centroids)
    tags = (grain + 1).astype(INDEX_DTYPE)
    if ck is not None:
        _art.save_bundle("mesh", ck, x=pts, cells=cells, cell_tags=tags)
    return Mesh(
        x=pts, cells=cells, cell_type=CellType.triangle, cell_tags=tags,
    )


def damage_seed_nodes(mesh: Mesh, *, n_chains: int = 30,
                      band: float = 0.15, seed: int = 333) -> np.ndarray:
    """Nodes of ~n_chains grain-boundary edge chains near y=0.5 — the
    polycrystal analog of the reference's 30 damaged edge tags
    (FEniCSx/...cc:359-361): d=1 seeds along grain boundaries, NOT a
    severing band (a full band disconnects the tension path and stalls
    Newton)."""
    from tpufem.mesh.topology import build_entities

    facets, c2f = build_entities(mesh, 1)
    nf = len(facets)
    tags = np.asarray(mesh.cell_tags, dtype=np.int64)
    tmin = np.full(nf, np.iinfo(np.int64).max)
    tmax = np.full(nf, -1, dtype=np.int64)
    nlf = c2f.shape[1]
    rep = np.repeat(tags, nlf)
    f = c2f.ravel().astype(np.int64)
    np.minimum.at(tmin, f, rep)
    np.maximum.at(tmax, f, rep)
    gb = tmax != tmin  # grain-boundary facets
    ymid = mesh.x[facets].mean(axis=1)[:, 1]
    cand = gb & (np.abs(ymid - 0.5) < band)
    pair = tmin * 100000 + tmax
    pairs = np.unique(pair[cand])
    if len(pairs) == 0:
        return np.zeros(0, dtype=np.int64)
    rng = np.random.default_rng(seed)
    chosen = rng.choice(pairs, size=min(n_chains, len(pairs)),
                        replace=False)
    sel = cand & np.isin(pair, chosen)
    return np.unique(facets[sel].ravel())


@dataclasses.dataclass
class PolycrystalResult:
    mesh: Mesh
    n_dofs: int
    u_flat: np.ndarray
    energy: float  # total potential (strain energy + load energy)
    stats: dict
    timings: dict
    strain: Optional[np.ndarray] = None  # (nc, 3) [e11,e12,e22] DG0
    stress: Optional[np.ndarray] = None  # (nc, 3)
    energy_density: Optional[np.ndarray] = None  # (nc,) sigma:eps
    energy_stiff: Optional[float] = None  # strain energy alone


def run(
    n: int = 128,
    *,
    n_grains: int = 200,
    use_ecst: bool = False,
    solver: Optional[SolverConfig] = None,
    wg_own: int = 16,
    gmsh_roundtrip: bool = False,
    smooth_iters: int = 8,
    n_damage_chains: int = 30,
    interpret: bool = False,
    mesh: Optional[Mesh] = None,
    mixed: bool = False,
    postprocess_fields: bool = True,
    output_path: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    use_volume: bool = True,
) -> PolycrystalResult:
    """End-to-end: generate (or take) the polycrystal, optional gmsh 2.2
    write+read round trip, per-grain E via the reference's glibc stream,
    damage band + smoothing, volumetric body force, LaneEngine
    Newton-Krylov solve.

    Mirrors the mechanic2d phase structure on the *unstructured* path —
    the reference's actual workload shape (doc.tex:163-187).

    ``use_volume``: include the volumetric load (the reference's
    benchmark build defines USE_VOLUME, FEniCSx/...cc:4,559-588). The
    load term is linear in u, so its assembled gradient is a CONSTANT
    vector with zero tangent — it is assembled ONCE with the flat
    Assembler at the exact quadrature degree (degree 2, the reference's
    Measure metadata split, asym_ufl.py:78-81) and enters the solve as
    ``const_residual`` — the reference's own 'Fcst' precomputed-load
    variant (doc.tex:1583-1586) — keeping the lane kernels on the
    single-term degree-1 fused path.
    """
    import jax
    import jax.numpy as jnp

    from tpufem.config import enable_persistent_cache

    enable_persistent_cache()
    from tpufem.cases import mechanic2d
    from tpufem.cases.damage import smooth_damage
    from tpufem.forms import EnergyFunctional, asym_damage_psi
    from tpufem.forms.form import Coefficient, Term
    from tpufem.lane import LaneEngine
    from tpufem.spaces import DirichletBC, FunctionSpace
    from tpufem.spaces.bc import locate_dofs_geometrical

    timings = {}
    t0 = time.perf_counter()
    if mesh is None:
        mesh = generate_polycrystal(n, n_grains=n_grains)
    timings["2.1 generate/read mesh"] = time.perf_counter() - t0

    if gmsh_roundtrip:
        import os
        import tempfile

        from tpufem.mesh.gmsh import read_gmsh, write_gmsh

        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "poly.msh")
            write_gmsh(path, mesh)
            mesh = read_gmsh(path)
        timings["2.1b gmsh roundtrip"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    V = FunctionSpace.create(mesh, 1, bs=2)
    DS = FunctionSpace.create(mesh, 1, bs=1)
    timings["3.1 define space"] = time.perf_counter() - t0

    # per-grain Young's modulus from the reference's srand(6575) stream
    t0 = time.perf_counter()
    E_range = mechanic2d.young_modulus_range(use_ecst=use_ecst)
    tags = np.asarray(mesh.cell_tags, dtype=np.int64)
    E_cell = E_range[tags % 200]
    timings["4.1 material constant"] = time.perf_counter() - t0

    # damage: grain-boundary edge chains seeded d=1, smoothed by the
    # reference's loop (mirrors the 30-tag damaged-edge list,
    # FEniCSx/...cc:359-361)
    t0 = time.perf_counter()
    d0 = np.zeros(DS.n_dofs)
    if n_damage_chains > 0:
        d0[damage_seed_nodes(mesh, n_chains=n_damage_chains)] = 1.0
    import jax.numpy as jnp

    # d0 stays a host array: on the tunnel platform smooth_damage's
    # auto backend runs the host twin, and the device path uploads it
    # itself
    d = np.asarray(smooth_damage(mesh, d0, iterations=smooth_iters))
    timings["3.2 define damage"] = time.perf_counter() - t0

    NU = 0.3
    t0 = time.perf_counter()
    # per-cell E enters as a P0 coefficient
    P0 = FunctionSpace.create(mesh, 0, bs=1)
    stiff = Term(
        integrand=lambda qp: asym_damage_psi(
            qp.eps, qp.coeff("d"), qp.coeff("E"), NU
        ),
        degree=1,
    )
    F = EnergyFunctional(
        V, [stiff], [Coefficient("d", DS), Coefficient("E", P0)]
    )
    left = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0]) < 1e-12)
    right = locate_dofs_geometrical(V, lambda x: np.abs(x[:, 0] - 1) < 1e-12)
    bcs = [DirichletBC(V, left, [0.0, 0.0]),
           DirichletBC(V, right, [0.01, 0.0])]
    timings["5.1 dirichlet setting"] = time.perf_counter() - t0

    # volumetric body force, assembled once as a constant residual term
    # (exact: the term is linear in u — MFEM Fcst, doc.tex:1583-1586)
    t0 = time.perf_counter()
    r_load = None
    if use_volume:
        from tpufem.assemble.assembler import Assembler

        fvals = mechanic2d.volumetric_load(V.dof_coords)
        dt_load = jnp.float64 if mixed else jnp.float32
        f_vec = jnp.asarray(fvals.reshape(-1), dtype=dt_load)
        load = Term(
            integrand=lambda qp: -jnp.dot(qp.coeff("f"), qp.u),
            degree=2,
        )
        F_load = EnergyFunctional(V, [load], [Coefficient("f", V)])
        r_load = jax.jit(
            lambda a, f: a.residual(
                jnp.zeros(V.n_dofs, dtype=dt_load), {"f": f},
                batch=65536,
            )
        )(Assembler(F_load, []), f_vec)
    timings["5.2 neumann/volume setting"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    # mixed runs keep all lane-engine state in f32 (the inner-CG
    # dtype): halves every setup upload through the axon tunnel; the
    # f64 outer residuals come from the flat Assembler, so accuracy
    # is unchanged (tests/test_lane.py::test_store_f32_residual_and_lazy_x_lane)
    eng = LaneEngine(
        F, bcs, wg_own=wg_own, interpret=interpret, fused=True,
        store_dtype=(np.float32 if mixed else None),
    )
    # HOST arrays: prepare_coeffs gathers on the host; handing it
    # device arrays forces a device->host pull through the tunnel
    # (measured 425 s at n=256 — most of round 4's 'plan+coeffs' tax)
    cc = eng.prepare_coeffs({"d": d, "E": E_cell})
    timings["7.1 lane plan + coeffs"] = time.perf_counter() - t0

    cfg = solver or SolverConfig(
        cg_rtol=1e-8, newton_rtol=1e-6, cg_maxit=20000,
        preconditioner="twolevel", error_on_nonconvergence=False,
    )
    t0 = time.perf_counter()
    use_tl = cfg.preconditioner == "twolevel"
    if mixed:
        # f64 outer Newton (flat assembler) + inner-dtype lane CG:
        # converges past the f32 residual floor to the reference's f64
        # accuracy. Requires jax_enable_x64.
        solve = eng.make_mixed_solver(
            cfg,
            cg_chunk=20 if use_tl else 200,
            fine_coeffs={"d": d, "E": E_cell} if use_tl else None,
            checkpoint_path=checkpoint_path,
            const_residual=r_load,
        )
        u64, stats = solve(
            jnp.zeros(V.n_dofs, dtype=jnp.float64),
            {"d": d, "E": E_cell},
            cc,
        )
    else:
        solve = eng.make_solver(
            cfg,
            cg_chunk=20 if use_tl else 200,
            fine_coeffs=(
                {"d": d, "E": E_cell} if use_tl else None
            ),
            const_residual=(
                None if r_load is None
                else jnp.asarray(eng.plan.to_lane(
                    np.asarray(r_load), eng.bs
                ), dtype=eng.bc_lane.dtype)
            ),
        )
        u_lane, stats = solve(jnp.zeros_like(eng.bc_lane), cc)
    timings["7.3 nonlinear resolution"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if mixed:
        # f64 energy via the flat Assembler (pure XLA — the lane
        # kernels are Pallas and Mosaic has no f64 on TPU)
        from tpufem.assemble.assembler import Assembler

        from tpufem.utils.xfer64 import get_f64, put_f64

        u_flat = get_f64(u64)  # ONE tunnel-safe pull (f32 components)
        coeffs_dev = {"d": put_f64(d), "E": put_f64(E_cell)}
        asm = Assembler(F, bcs)
        energy = float(asm.energy(u64, coeffs_dev, batch=65536))
        energy_stiff = energy
        if r_load is not None:
            # load energy is linear: E_load(u) = r_load . u exactly
            energy += float(jnp.vdot(r_load, u64))
    else:
        u_flat = eng.from_lane(u_lane)
        u_cells = eng._gather_cells(u_lane)
        fn, xarg, xax = eng._elem_args(u_lane.dtype)
        from tpufem.lane.engine import _strip_private

        # cc carries the private ``_cd`` fused block (per-bin layout);
        # the per-cell energy vmap needs the cells-minor leaves only
        e_cells = jax.vmap(fn, in_axes=(-1,) + xax + (-1,))(
            u_cells, xarg, _strip_private(cc)
        )
        valid = jnp.asarray(eng.plan.cell_valid)
        energy = float(jnp.sum(jnp.where(valid, e_cells, 0.0)))
        energy_stiff = energy
        if r_load is not None:
            energy += float(np.vdot(np.asarray(r_load), u_flat))
    timings["8 postprocess (energy)"] = time.perf_counter() - t0

    # DG0 centroid strain/stress/energy-density — the reference's
    # "8.1 strain/stress computation" phase (FEniCSx/...cc:909-942)
    # on the polycrystal workload, via the flat expression kernel
    # (slab-batched: bounded temps at multi-million-cell meshes)
    t0 = time.perf_counter()
    strain = stress = endens = None
    if postprocess_fields:
        from tpufem.assemble.assembler import Assembler
        from tpufem.cases.mechanic2d import postprocess as _dg0

        if not mixed:
            asm = Assembler(F, bcs)
        if mixed:
            # reuse the device iterate + coeffs — no re-upload
            u_pp, c_pp = u64, coeffs_dev
        else:
            u_pp = jnp.asarray(u_flat)
            c_pp = {"d": jnp.asarray(d, u_pp.dtype),
                    "E": jnp.asarray(E_cell, u_pp.dtype)}
        strain, stress, endens = _dg0(asm, u_pp, c_pp, batch=65536)
    timings["8.1 strain/stress computation"] = time.perf_counter() - t0

    # parallel-output analog of the reference's phase 8 (XDMF/VTX,
    # FEniCSx/...cc:946-1032): XDMF + binary sidecars (scale-safe)
    if output_path is not None:
        from tpufem.io.xdmf import write_xdmf

        t0 = time.perf_counter()
        point_data = {
            "u": u_flat.reshape(-1, 2), "damage": np.asarray(d),
        }
        cell_data = {
            "E": np.asarray(E_cell),
            "grain": np.asarray(mesh.cell_tags, np.float64),
        }
        if postprocess_fields:
            cell_data.update(
                strain=strain, stress=stress, energy_density=endens,
            )
        write_xdmf(output_path, mesh, point_data=point_data,
                   cell_data=cell_data)
        timings["8 outputs"] = time.perf_counter() - t0

    return PolycrystalResult(
        mesh=mesh, n_dofs=V.n_dofs, u_flat=u_flat, energy=energy,
        stats=stats, timings=timings,
        strain=strain, stress=stress, energy_density=endens,
        energy_stiff=energy_stiff,
    )
