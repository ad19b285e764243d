"""Per-layer MACs breakdown for one family, dense vs sparse.

VERDICT r4 item 2: PD's sparse MACs ratio (2.7x) sits far below the
reference's published 7-18x band — this tool shows exactly WHERE the
sparse MACs stay dense. Every conv/dense/bmm site sows its analytic MACs
(a trace-time constant: sige_tpu/nn/module.py sow_macs), so the whole
breakdown comes from ONE abstract trace per mode via jax.eval_shape —
no device work, no compile.

    JAX_PLATFORMS=cpu python scripts/macs_breakdown.py --family pd
    ... --group 3   # aggregate module paths to depth 3
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(family, dtype):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_sparse import _build as pb
    return pb(family, dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="pd",
                   choices=["ddpm", "pd", "gaugan", "sd", "decoder",
                            "encoder"])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--group", type=int, default=2,
                   help="module-path depth to aggregate at")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from sige_tpu.nn.module import SIGECtx

    step, dense, v, x = _build(args.family, args.dtype)

    # The profile_sparse builders return closures that call module.apply
    # with the right ctx; eval_shape them with sow_macs patched — every
    # sown MACs value is a trace-time constant, so the whole breakdown
    # costs one abstract trace per mode (no device work, no compile).
    import jax

    from sige_tpu.nn import module as M

    def run(fn, tag):
        rows = []
        orig = M.sow_macs

        def patched(mod, n):
            rows.append(("/".join(str(p) for p in mod.path), int(n)))
            orig(mod, n)

        M.sow_macs = patched
        try:
            jax.eval_shape(fn, v, x)
        finally:
            M.sow_macs = orig
        total = sum(n for _, n in rows)
        print(f"\n== {args.family} {tag}: {total/1e9:.2f} GMACs over "
              f"{len(rows)} sites ==")
        return rows, total

    sparse_rows, sparse_total = run(step, "sparse")
    dense_rows, dense_total = run(dense, "dense")
    print(f"\nratio: {dense_total/max(sparse_total,1):.2f}x")

    def agg(rows):
        g = collections.Counter()
        for path, n in rows:
            parts = path.split("/")
            g["/".join(parts[:args.group])] += n
        return g

    gs, gd = agg(sparse_rows), agg(dense_rows)
    print(f"\n{'module (depth '+str(args.group)+')':<44} "
          f"{'dense G':>9} {'sparse G':>9} {'ratio':>6} {'% of sparse':>11}")
    for path, sn in sorted(gs.items(), key=lambda kv: -kv[1])[:args.top]:
        dn = gd.get(path, 0)
        r = dn / sn if sn else float("inf")
        print(f"{path:<44} {dn/1e9:>9.2f} {sn/1e9:>9.2f} {r:>6.2f} "
              f"{100*sn/max(sparse_total,1):>10.1f}%")
    only_dense = {p: n for p, n in gd.items() if p not in gs}
    if only_dense:
        print("\n-- dense-only sites (0 sparse MACs) --")
        for pth, n in sorted(only_dense.items(), key=lambda kv: -kv[1])[:10]:
            print(f"{pth:<44} {n/1e9:>9.2f}")


if __name__ == "__main__":
    main()
