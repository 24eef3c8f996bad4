"""``python -m tpufem`` — see tpufem/cli.py."""

import sys

from tpufem.cli import main

sys.exit(main())
