"""One-shot TPU measurement: naive vs flash-attention bench capture.

Run when the axon tunnel is healthy:

    python scripts/measure_tpu.py [--iters 50]

1. checks the TPU is reachable (fails fast instead of hanging),
2. runs bench.py with the default (naive einsum) attention,
3. runs the SD families again with SIGE_FLASH_ATTN=1,
4. prints both JSON lines and a one-line comparison.

The flash default stays off until this comparison shows a win on chip
(sige_tpu/ops/attention.py).
"""

import argparse
import json
import os
import subprocess
import sys


def _run(env_extra, families, iters):
    env = dict(os.environ, **env_extra)
    cmd = [sys.executable, "bench.py", "--iters", str(iters),
           "--families", families]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))) or ".")
    if out.returncode != 0:
        print(out.stdout, out.stderr, file=sys.stderr)
        raise SystemExit(f"bench failed rc={out.returncode}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    # probe the resolved platform directly: stderr can contain strings
    # like "Unable to initialize backend 'tpu'" even on CPU fallback, so
    # substring-matching combined output false-passes (ADVICE r3)
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices()[0]; print(d.platform); print(d)"],
        capture_output=True, text=True, timeout=180)
    lines = probe.stdout.strip().splitlines()
    if probe.returncode != 0 or not lines or lines[0] != "tpu":
        raise SystemExit(f"TPU not reachable: {probe.stdout}{probe.stderr}")
    print("device:", lines[-1])

    naive = _run({}, "ddpm,decoder,encoder,gaugan,pd,serving", args.iters)
    print("NAIVE:", json.dumps(naive))
    flash = _run({"SIGE_FLASH_ATTN": "1"}, "decoder,encoder", args.iters)
    print("FLASH:", json.dumps(flash))

    n, f = naive["detail"]["sd_unet_512"], flash["detail"]["sd_unet_512"]
    print(f"SD UNet dense  : naive {n['dense_ms']} ms -> flash {f['dense_ms']} ms")
    print(f"SD UNet sparse : naive {n['sparse_ms']} ms -> flash {f['sparse_ms']} ms")
    for key in ("sd_vae_decoder_512", "sd_vae_encoder_512"):
        if key in naive["detail"] and key in flash["detail"]:
            nn, ff = naive["detail"][key], flash["detail"][key]
            if "dense_ms" in nn and "dense_ms" in ff:
                print(f"{key}: dense {nn['dense_ms']} -> {ff['dense_ms']} ms, "
                      f"sparse {nn['sparse_ms']} -> {ff['sparse_ms']} ms")


if __name__ == "__main__":
    main()
