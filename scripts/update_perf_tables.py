"""Regenerate README/STATUS perf tables from a captured bench JSON.

Published numbers must come from the driver capture, never from memory
or a local run quoted as captured (VERDICT r3 weak-1 / ADVICE r3). This
rewrites the block between ``<!-- BENCH_TABLE --> / <!-- /BENCH_TABLE -->``
markers in README.md and STATUS.md from the newest ``BENCH_r*.json``
(or an explicit ``--capture`` file / a fresh ``bench.py`` output line).

    python scripts/update_perf_tables.py            # newest BENCH_r*.json
    python scripts/update_perf_tables.py --capture /tmp/bench.json \
        --label "local run 2026-08-19"
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    ("sd_unet_512", "Stable Diffusion U-Net @512, CFG batch 2"),
    ("sd_vae_decoder_512", "SD VAE decoder @512"),
    ("sd_vae_encoder_512", "SD VAE encoder @512"),
    ("ddpm_church256", "DDPM church256 U-Net"),
    ("gaugan_512x256", "GauGAN 512x256"),
    ("gaugan_gc_512x256", "GauGAN + GAN-Compression 512x256"),
    ("pd_church256", "PD church256"),
]

MACS_ROWS = [
    ("sd_unet_512", "SD U-Net MACs"),
    ("sd_vae_decoder_512", "SD VAE decoder MACs (dilate-40 decode mask)"),
    ("sd_vae_encoder_512", "SD VAE encoder MACs"),
    ("ddpm_church256", "DDPM church256 MACs"),
    ("gaugan_512x256", "GauGAN MACs"),
    ("gaugan_gc_512x256", "GauGAN + GAN-Compression MACs"),
    ("pd_church256", "PD MACs"),
]


def render(capture: dict, label: str) -> str:
    d = capture["detail"]
    lines = [f"| Benchmark | Dense | Sparse | Speedup |", "|---|---|---|---|"]
    for key, name in ROWS:
        row = d.get(key)
        if not row or "dense_ms" not in row:
            continue
        dn, sp = row["dense_ms"], row["sparse_ms"]
        if not sp or sp <= 0:
            raise SystemExit(f"{key}: invalid sparse_ms {sp} in the capture "
                             "— fix the measurement, do not publish it")
        lines.append(f"| {name} | {dn} ms | {sp} ms | **{dn / sp:.1f}x** |")
    for key, name in MACS_ROWS:
        row = d.get(key)
        if not row or "dense_gmacs" not in row:
            continue
        dg, sg = row["dense_gmacs"], row["sparse_gmacs"]
        lines.append(f"| {name} | {dg} G | {sg} G | {dg / sg:.1f}x |")
    srv = d.get("serving_4_sessions")
    if srv and "batch_step_ms" in srv:
        lines.append(
            f"| {srv['sessions']}-session serving (one vmapped step) "
            f"| — | {srv['batch_step_ms']} ms "
            f"({srv['batch_step_ms'] / srv['sessions']:.2f} ms/session) "
            f"| {srv['session_steps_per_s']} steps/s |")
    sd = d.get("sd_unet_512", {})
    if sd.get("hbm_dense_mb") and sd.get("hbm_sparse_mb"):
        lines.append(f"| SD U-Net peak HBM (compiled step) "
                     f"| {sd['hbm_dense_mb']} MB | {sd['hbm_sparse_mb']} MB "
                     f"| {sd['hbm_dense_mb'] / sd['hbm_sparse_mb']:.1f}x |")
    lines.append("")
    lines.append(f"(Source: {label}; device `{d.get('device', '?')}`, "
                 f"dtype {sd.get('dtype', '?')} for the SD families.)")
    return "\n".join(lines)


def rewrite(path: str, table: str) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(r"(<!-- BENCH_TABLE -->\n).*?(<!-- /BENCH_TABLE -->)",
                     re.S)
    if not pat.search(text):
        return False
    new = pat.sub(lambda m: m.group(1) + table + "\n" + m.group(2), text)
    with open(path, "w") as f:
        f.write(new)
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capture", default=None)
    p.add_argument("--label", default=None)
    args = p.parse_args()

    path = args.capture
    if path is None:
        caps = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not caps:
            raise SystemExit("no BENCH_r*.json found")
        path = caps[-1]
    with open(path) as f:
        capture = json.load(f)
    if "parsed" in capture:  # driver BENCH_r*.json wraps the bench line
        capture = capture["parsed"]
    label = args.label or os.path.basename(path)
    table = render(capture, label)
    print(table)
    for name in ("README.md", "STATUS.md"):
        ok = rewrite(os.path.join(ROOT, name), table)
        print(f"{name}: {'updated' if ok else 'NO MARKERS — not touched'}")


if __name__ == "__main__":
    main()
