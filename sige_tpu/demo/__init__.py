"""Interactive editing demo (the reference's PyQt app, reimplemented as a
zero-dependency web UI; reference: diffusion_demo/)."""

from .runner import DemoRunner, MultiSessionDemoRunner

__all__ = ["DemoRunner", "MultiSessionDemoRunner"]
