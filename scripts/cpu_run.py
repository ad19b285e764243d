"""Run a script or module CPU-only (axon backend deregistered).

The axon TPU plugin initializes on first jax use even when a script
needs no TPU, contending with (or blocking behind) the one process the
tunnel allows. This wrapper applies tests/conftest.py's preamble and
then runpy's the target:

    python scripts/cpu_run.py <script.py> [args...]
    python scripts/cpu_run.py -m <module> [args...]
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if sys.argv[1] == "-m":
    mod, sys.argv = sys.argv[2], sys.argv[2:]
    runpy.run_module(mod, run_name="__main__", alter_sys=True)
else:
    path, sys.argv = sys.argv[1], sys.argv[1:]
    runpy.run_path(path, run_name="__main__")
