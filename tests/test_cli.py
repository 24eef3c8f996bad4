"""CLI (tpufem/cli.py) — the reference OptionsParser analog
(MFEM/mechanic2d/asym_elasto_damage_model.cc:986-1008)."""

import numpy as np
import pytest

from tpufem.cli import build_parser, main


def test_parser_defaults_match_reference():
    # MFEM defaults: -r 0, -rel 1e-7, -abs 5e-8 (MFEM/...cc:986-1003)
    args = build_parser().parse_args(["mechanic2d"])
    assert args.refine == 0
    assert args.rel == 1e-7
    assert args.abs_ == 5e-8
    assert args.maxit == 10
    assert args.cg_rtol == 1e-12
    assert args.convergence == "r0"


def test_parser_solver_flags():
    args = build_parser().parse_args(
        ["polycrystal", "-n", "64", "--grains", "20", "--pc", "amg",
         "--convergence", "du0", "--rel", "1e-6"]
    )
    assert args.n == 64 and args.grains == 20
    assert args.pc == "amg" and args.convergence == "du0"
    assert args.rel == 1e-6


def test_cli_elasticity3d_end_to_end(capsys):
    rc = main(["elasticity3d", "-n", "4", "--cg-rtol", "1e-8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dofs: 375" in out  # 5^3 nodes x 3 components
    assert "newton=1" in out


@pytest.mark.slow
def test_cli_mechanic2d_square(capsys):
    rc = main(["mechanic2d", "--cg-rtol", "1e-10"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "newton iterations:" in out
    # phase table rows (reference schema, FEniCSx/...cc:1199-1219)
    assert "7.3 NonLinear resolution" in out
    m = [ln for ln in out.splitlines() if "|u|_inf" in ln]
    assert m and np.isfinite(float(m[0].split("=")[1].split()[0]))
