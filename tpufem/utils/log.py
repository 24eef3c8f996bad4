"""Structured logging: per-host log files + solver traces.

Equivalent of the reference's logging stack (SURVEY.md §5.5): loguru
init with per-rank thread names (FEniCSx/mechanic2d/
asym_elasto_damage_model.cc:108-132), per-rank stdout redirect with
ranks>50 silenced (:134-139; MFEM/...cc:967-972), and the verbose Newton
convergence printer (:869-891).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_FORMAT = "%(asctime)s (%(relativeCreated)8.3fs) [%(name)s] %(levelname)s| %(message)s"


def init_logging(
    level: int = logging.INFO,
    host_id: Optional[int] = None,
    n_hosts: int = 1,
    log_dir: Optional[str] = None,
    silence_above: int = 50,
) -> logging.Logger:
    """Configure the tpufem logger.

    With multiple hosts, each host writes ``proc_<id>_output.txt`` in
    ``log_dir`` and hosts above ``silence_above`` are silenced — the
    reference's exact convention (FEniCSx/...cc:134-139).
    """
    logger = logging.getLogger("tpufem")
    logger.setLevel(level)
    logger.handlers.clear()
    if host_id is None or n_hosts == 1:
        h = logging.StreamHandler(sys.stdout)
    elif host_id > silence_above:
        h = logging.NullHandler()
    else:
        os.makedirs(log_dir or ".", exist_ok=True)
        h = logging.FileHandler(
            os.path.join(log_dir or ".", f"proc_{host_id}_output.txt")
        )
    h.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(h)
    logger.propagate = False
    return logger


def get_logger(name: str = "tpufem") -> logging.Logger:
    return logging.getLogger(name)
