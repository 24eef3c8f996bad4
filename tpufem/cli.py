"""Runtime command-line interface for the bundled workloads.

The reference drives its runs through ``mfem::OptionsParser``
(MFEM/mechanic2d/asym_elasto_damage_model.cc:986-1008: ``-r`` refine,
``-rel``/``-abs`` Newton tolerances, ``-v`` verbosity, ``-petscopts``)
plus a compile-time macro matrix (FEniCSx/...cc:1-26). Here both tiers
collapse into one argparse CLI over the dataclass configs in
``tpufem.config``::

    python -m tpufem mechanic2d -r 2 --rel 1e-7 --abs 5e-8 --pc amg
    python -m tpufem polycrystal -n 512 --grains 200 --mixed
    python -m tpufem elasticity3d -n 32 --cell hexahedron
    python -m tpufem neohookean -n 24

Each subcommand prints the Newton trace and the reference-schema phase
timing table (FEniCSx/...cc:1199-1219) and exits non-zero on solver
non-convergence.
"""

from __future__ import annotations

import argparse
import sys


def _add_solver_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("solver (reference: -rel/-abs/-petscopts)")
    g.add_argument("--rel", type=float, default=1e-7,
                   help="Newton relative tolerance (default 1e-7)")
    g.add_argument("--abs", dest="abs_", type=float, default=5e-8,
                   help="Newton absolute tolerance (default 5e-8)")
    g.add_argument("--maxit", type=int, default=10,
                   help="Newton max iterations (default 10)")
    g.add_argument("--cg-rtol", type=float, default=1e-12,
                   help="CG relative tolerance (default 1e-12)")
    g.add_argument("--cg-maxit", type=int, default=2000,
                   help="CG max iterations (default 2000)")
    # default=None so subcommands can tell "flag not given" apart from
    # an explicit --pc jacobi and pick their own default (ADVICE r2)
    g.add_argument("--pc", default=None,
                   choices=["none", "jacobi", "chebyshev", "block_jacobi",
                            "amg", "twolevel"],
                   help="preconditioner (default: jacobi, or twolevel on "
                        "the polycrystal subcommand; amg = SA-AMG with "
                        "rigid-body-mode near-nullspace)")
    g.add_argument("--convergence", default="r0", choices=["r0", "du0"],
                   help="nonlinear convergence convention: r0 (MFEM) or "
                        "du0 (dolfinx); doc.tex:2065-2068")


def _solver_config(args, **overrides):
    from tpufem.config import SolverConfig

    kw = dict(
        newton_rtol=args.rel, newton_atol=args.abs_,
        newton_maxit=args.maxit, cg_rtol=args.cg_rtol,
        cg_maxit=args.cg_maxit, convergence=args.convergence,
        preconditioner=args.pc if args.pc is not None else "jacobi",
    )
    kw.update(overrides)
    return SolverConfig(**kw)


def _cmd_mechanic2d(args) -> int:
    from tpufem.cases import mechanic2d
    from tpufem.config import Mechanic2DConfig

    pc = args.pc if args.pc is not None else "jacobi"
    if pc in ("twolevel",):
        print("mechanic2d: --pc twolevel is a lane-engine option; "
              "using amg", file=sys.stderr)
        pc = "amg"
    cfg = Mechanic2DConfig(
        max_refine=args.refine, max_dam=args.max_dam,
        use_trac=not args.compression, use_ecst=args.ecst,
        mesh_path=args.mesh, degree=args.degree,
        output_dir=args.output,
        solver=_solver_config(args, preconditioner=pc),
    )
    res = mechanic2d.run(cfg)
    u = res.u
    print(f"newton iterations: {res.newton_iterations}  "
          f"cg: {res.krylov_iters}")
    print(f"|u|_inf = {float(abs(u).max()):.6e}  "
          f"energy = {float(res.energy.sum()):.6e}")
    print(res.timers.report())
    return 0


def _cmd_polycrystal(args) -> int:
    from tpufem.cases import polycrystal

    res = polycrystal.run(
        args.n, n_grains=args.grains, use_ecst=args.ecst,
        solver=_solver_config(
            args,
            preconditioner=args.pc if args.pc is not None else "twolevel",
        ),
        wg_own=args.wg_own, smooth_iters=args.smooth_iters,
        n_damage_chains=args.chains, mixed=args.mixed,
        output_path=args.output,
    )
    print(f"dofs: {res.n_dofs}  energy = {res.energy:.6e}")
    print(f"stats: {res.stats}")
    for k, v in res.timings.items():
        print(f"  {k:<34s} {v:10.3f} s")
    return 0


def _cmd_elasticity3d(args) -> int:
    from tpufem.cases import elasticity3d
    from tpufem.mesh.mesh import CellType

    cfg = elasticity3d.Elasticity3DConfig(
        n=args.n,
        cell_type=(CellType.hexahedron if args.cell == "hexahedron"
                   else CellType.tetra),
        matrix_free=not args.matrix,
        solver=_solver_config(
            args, cg_rtol=args.cg_rtol,
            preconditioner=args.pc if args.pc is not None else "jacobi",
        ),
    )
    res, V, _mesh = elasticity3d.run(cfg)
    print(f"dofs: {V.n_dofs}  newton={int(res.newton_iters)} "
          f"|r|={float(res.final_residual):.3e}")
    return 0


def _cmd_neohookean(args) -> int:
    from tpufem.cases import neohookean

    cfg = neohookean.NeoHookeanConfig(
        n=args.n,
        solver=_solver_config(
            args,
            preconditioner=args.pc if args.pc is not None else "jacobi",
        ),
    )
    res, V, _mesh = neohookean.run(cfg)
    print(f"dofs: {V.n_dofs}  newton={int(res.newton_iters)} "
          f"|r|={float(res.final_residual):.3e}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tpufem",
        description="TPU-native FEM framework — bundled workloads "
                    "(the reference study's driver matrix as subcommands)",
    )
    ap.add_argument("-v", "--verbose", action="count", default=0,
                    help="increase log verbosity")
    ap.add_argument("--x64", action="store_true",
                    help="enable float64 (reference precision)")
    sub = ap.add_subparsers(dest="command", required=True)

    m = sub.add_parser("mechanic2d",
                       help="asym elasto-damage on a gmsh mesh "
                            "(the reference workload)")
    m.add_argument("-r", "--refine", type=int, default=0,
                   help="uniform refinements (reference -r / MAX_REFINE)")
    m.add_argument("--max-dam", type=float, default=1.0,
                   help="damage band amplitude (MAX_DAM)")
    m.add_argument("--mesh", default=None,
                   help="gmsh 2.2 or XDMF mesh path (default: bundled "
                        "square.msh)")
    m.add_argument("--degree", type=int, default=1, choices=[1, 2],
                   help="displacement space degree")
    m.add_argument("--compression", action="store_true",
                   help="-0.01 imposed displacement (reference: "
                        "undef USE_TRAC)")
    m.add_argument("--ecst", action="store_true",
                   help="constant E=1e6 instead of per-grain random "
                        "(USE_ECST)")
    m.add_argument("--output", default=None, help="output directory "
                   "(writes VTU + XDMF fields)")
    _add_solver_flags(m)
    m.set_defaults(fn=_cmd_mechanic2d)

    p = sub.add_parser("polycrystal",
                       help="generated Neper-like polycrystal at scale "
                            "through the lane engine")
    p.add_argument("-n", type=int, default=128,
                   help="lattice resolution of the jittered Delaunay "
                        "(128 -> ~33k dofs, 1024 -> ~2.1M)")
    p.add_argument("--grains", type=int, default=200,
                   help="number of Voronoi grains (reference: 200)")
    p.add_argument("--chains", type=int, default=30,
                   help="damaged grain-boundary chains (reference: 30)")
    p.add_argument("--smooth-iters", type=int, default=8,
                   help="damage smoothing iterations "
                        "(reference: 8*(MAX_REFINE+1))")
    p.add_argument("--wg-own", type=int, default=16)
    p.add_argument("--mixed", action="store_true",
                   help="mixed precision: f64 Newton + f32 lane CG")
    p.add_argument("--ecst", action="store_true")
    p.add_argument("--output", default=None,
                   help="output path stem (XDMF + binary sidecars)")
    _add_solver_flags(p)
    p.set_defaults(fn=_cmd_polycrystal)

    e = sub.add_parser("elasticity3d",
                       help="3D linear elasticity (pulled bar)")
    e.add_argument("-n", type=int, default=16, help="elements per side")
    e.add_argument("--cell", default="hexahedron",
                   choices=["hexahedron", "tetra"])
    e.add_argument("--matrix", action="store_true",
                   help="assembled-ELL operator instead of matrix-free")
    _add_solver_flags(e)
    e.set_defaults(fn=_cmd_elasticity3d, pc="chebyshev", cg_rtol=1e-10)

    nh = sub.add_parser("neohookean",
                        help="neo-Hookean hyperelasticity (Newton-Krylov)")
    nh.add_argument("-n", type=int, default=16)
    _add_solver_flags(nh)
    nh.set_defaults(fn=_cmd_neohookean)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.x64:
        import jax

        jax.config.update("jax_enable_x64", True)
    if args.verbose:
        import logging

        from tpufem.utils.log import init_logging

        init_logging(logging.DEBUG if args.verbose > 1 else logging.INFO)
    try:
        return args.fn(args)
    except Exception as e:  # reference: MPI_Abort(-1234) on failure
        from tpufem.nls.newton import NonConvergenceError

        if isinstance(e, NonConvergenceError):
            print(f"NONCONVERGED: {e}", file=sys.stderr)
            return 2
        raise


if __name__ == "__main__":
    sys.exit(main())
