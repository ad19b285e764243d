"""Micro-bench: naive vs bespoke flash at SD attention shapes on chip.

Usage: PYTHONPATH=... python scripts/microflash.py [--tune]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp

from sige_tpu.ops.flash import flash_mha, flash_mha_bhsd

print("device:", jax.devices()[0])

# SD self-attn shapes: (B, N, H, D) — B=2 (CFG), spatial levels
SHAPES = [
    (2, 4096, 8, 40),   # 64x64 level
    (2, 1024, 8, 80),   # 32x32
    (2, 256, 8, 160),   # 16x16
    (1, 4096, 1, 512),  # VAE mid attention (decoder/encoder)
    (2, 4096, 8, 40, 4173),  # masked stale-K/V-ish ragged M (pads to 4224)
]


def timed(fn, iters=50):
    jax.block_until_ready(fn())  # compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tune", action="store_true")
    args = ap.parse_args()

    for shp in SHAPES:
        B, N, H, D = shp[:4]
        M = shp[4] if len(shp) > 4 else N
        mp = -(-M // 128) * 128
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, N, H, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, mp, H, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, mp, H, D), jnp.bfloat16)
        bias = jnp.where(jnp.arange(mp) >= M, -1e9, 0.0) if mp != M else None
        scale = D ** -0.5

        @jax.jit
        def naive(q=q, k=k, v=v, bias=bias):
            sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            if bias is not None:
                sim = sim + bias.astype(sim.dtype)
            a = jax.nn.softmax(sim, axis=-1)
            return jnp.einsum("bhnm,bmhd->bnhd", a, v)

        @jax.jit
        def bespoke(q=q, k=k, v=v, bias=bias):
            return flash_mha(q, k, v, scale, bias=bias)

        tn = timed(naive)
        tb = timed(bespoke)
        err = float(jnp.max(jnp.abs(naive().astype(jnp.float32)
                                    - bespoke().astype(jnp.float32))))
        print(f"B{B} N{N} H{H} D{D} M{M}: naive {tn:.3f} ms  "
              f"bespoke {tb:.3f} ms  ({tn/tb:.2f}x) maxerr {err:.4f}")

        if args.tune:
            G = B * H
            qf = jnp.swapaxes(q, 1, 2).reshape(G, N, D)
            kf = jnp.swapaxes(k, 1, 2).reshape(G, mp, D)
            vf = jnp.swapaxes(v, 1, 2).reshape(G, mp, D)
            b2 = (jnp.zeros((1, mp), jnp.float32) if bias is None
                  else jnp.asarray(bias, jnp.float32).reshape(1, mp))
            for bq in (128, 256, 512, 1024):
                for bk in (128, 256, 512, 1024):
                    if N % bq or mp % bk or bq > N or bk > mp:
                        continue
                    try:
                        fn = functools.partial(
                            flash_mha_bhsd, qf, kf, vf, b2,
                            scale=float(scale), block_q=bq, block_k=bk)
                        t = timed(fn, iters=30)
                        print(f"    bq={bq:4d} bk={bk:4d}: {t:.3f} ms")
                    except Exception as e:  # noqa: BLE001
                        print(f"    bq={bq:4d} bk={bk:4d}: FAIL "
                              f"{type(e).__name__}")


if __name__ == "__main__":
    main()
