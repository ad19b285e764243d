"""The examples/ walkthrough runs in CI (VERDICT r3 item 10): the 3-phase
protocol on the reference's golden mask asset, CI-size model."""

import os
import sys

import pytest


def test_walkthrough_small_runs(capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "examples"))
    try:
        import walkthrough
    finally:
        sys.path.pop(0)

    err = walkthrough.main(small=True)
    assert err < 5e-4
    out = capsys.readouterr().out
    assert "[phase 1: full]" in out
    assert "[phase 3: sparse]" in out
    assert "x reduction" in out
    # the golden mask asset is the fixture when the reference is present
    if os.path.isfile(walkthrough.GOLDEN_MASK):
        assert "golden mask" in out
