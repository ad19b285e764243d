"""Shared loader for the reference implementation as a torch oracle.

Builds /root/reference's sige CPU extension (torch cpp_extension, ninja-
cached in .ref_build/) and wires the reference Python packages so that
reference models can be instantiated and run in full AND sparse mode on
CPU — the ground truth for cross-implementation parity tests.
"""

import os
import sys
import types

REF_ROOT = "/root/reference"
BUILD_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".ref_build")
)
CPU_SOURCES = [
    os.path.join(REF_ROOT, "sige", "cpu", f)
    for f in [
        "gather.cpp",
        "scatter.cpp",
        "scatter_gather.cpp",
        "common_cpu.cpp",
        "pybind_cpu.cpp",
    ]
]

_cached = {}


def load_ref_cpu():
    """Build/load the reference sige.cpu extension. Raises on failure."""
    if "cpu" in _cached:
        return _cached["cpu"]
    from torch.utils.cpp_extension import load

    os.makedirs(BUILD_DIR, exist_ok=True)
    mod = load(
        name="sige_ref_cpu",
        sources=CPU_SOURCES,
        build_directory=BUILD_DIR,
        extra_cflags=["-O2", "-fopenmp"],
        extra_ldflags=["-fopenmp"],
        verbose=False,
    )
    _cached["cpu"] = mod
    return mod


def install_reference(suite=None):
    """Make the reference packages importable with the built cpu backend.

    ``suite`` additionally prepends an app directory ("diffusion",
    "gaugan", "stable-diffusion") so its ``models`` package imports.
    Returns the ``sige`` package.
    """
    cpu = load_ref_cpu()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # fused_unet.py imports torchprofile at module level; provide a stub
    # (profiling is never exercised by the parity tests)
    if "torchprofile" not in sys.modules:
        stub = types.ModuleType("torchprofile")
        stub.profile_macs = lambda *a, **k: 0
        sys.modules["torchprofile"] = stub
    # openaimodel.py imports omegaconf.listconfig.ListConfig only for an
    # isinstance check on context_dim; stub it (not installed here)
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.ListConfig = ListConfig
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    import sige  # noqa: F401

    # SIGEModule.load_runtime does importlib.import_module("sige.cpu")
    # (reference: sige/nn/base.py:35-50); register the built extension.
    sys.modules["sige.cpu"] = cpu
    sige.cpu = cpu
    if suite is not None:
        path = os.path.join(REF_ROOT, suite)
        if path not in sys.path:
            sys.path.insert(0, path)
    return sige


def import_suite_module(suite, modname):
    """Import ``modname`` (e.g. "models.ddpm_arch.sige_fused_unet") from a
    reference app suite.

    The app suites each define a TOP-LEVEL ``models`` package (diffusion,
    gaugan, stable-diffusion all collide); when switching suites the stale
    package entries are purged and the suite's directory moved to the
    front of sys.path.
    """
    import importlib

    install_reference(suite)
    path = os.path.join(REF_ROOT, suite)
    root = modname.split(".")[0]
    if _cached.get(("owner", root)) != suite:
        for k in list(sys.modules):
            if k == root or k.startswith(root + "."):
                del sys.modules[k]
        if path in sys.path:
            sys.path.remove(path)
        sys.path.insert(0, path)
        _cached[("owner", root)] = suite
    return importlib.import_module(modname)
