"""Bisect the axon-platform Pallas RNN-T crash region (VERDICT item 3).

Runs the Pallas RNN-T loss (fwd+bwd, jitted, on the real TPU) at a grid of
(B, T, U1) shapes, each in a fresh subprocess so a worker crash cannot take
down the harness. Prints one line per shape: OK / CRASH(rc) / TIMEOUT.

Usage: python scripts_dev/rnnt_bisect.py [quick|full|probe B T U1]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import os, sys
import numpy as np
os.environ["TFASR_LOSS_IMPL"] = "pallas"
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from tensorflowasr_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas

b, t, u1 = {b}, {t}, {u1}
v = 256
rng = np.random.default_rng(0)
# generate logits ON DEVICE: host->TPU transfer of hundreds of MB through
# the relay can dwarf the actual kernel time and fake a hang
logits = jax.random.normal(jax.random.PRNGKey(0), (b, t, u1, v), jnp.float32) * 0.1
logits.block_until_ready()
print("DATA_READY", flush=True)
labels = jnp.asarray(rng.integers(1, v, (b, u1 - 1)), jnp.int32)
tl = jnp.full((b,), t, jnp.int32)
ul = jnp.full((b,), u1 - 1, jnp.int32)

def f(lg):
    return jnp.mean(rnnt_loss_pallas(lg, tl, labels, ul))

fj = jax.jit(jax.value_and_grad(f))
lowered = fj.lower(logits)
print("LOWERED", flush=True)
compiled = lowered.compile()
print("COMPILED", flush=True)
val, grad = compiled(logits)
val = float(val)
print("EXECUTED", flush=True)
g0 = float(jnp.abs(grad).sum())
assert np.isfinite(val) and np.isfinite(g0), (val, g0)
print("RESULT", val, g0)
"""


def probe(repo: str, b: int, t: int, u1: int, timeout: int = 240) -> str:
    code = CHILD.format(repo=repo, b=b, t=t, u1=u1)
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="ignore")
        phases = [w for w in ("DATA_READY", "LOWERED", "COMPILED", "EXECUTED") if w in out]
        return f"TIMEOUT(after {'/'.join(phases) or 'start'})"
    if p.returncode == 0 and "RESULT" in p.stdout:
        return "OK"
    phases = [w for w in ("DATA_READY", "LOWERED", "COMPILED", "EXECUTED") if w in p.stdout]
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    return f"CRASH(rc={p.returncode}, after {'/'.join(phases) or 'start'}): " + " | ".join(tail)


def main():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "probe":
        b, t, u1 = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(f"B={b} T={t} U1={u1}:", probe(repo, b, t, u1))
        return

    if mode == "tiles":
        shapes = [
            (2, 50, 257),  # u1p=384, tiny T: does T matter at all?
            (2, 400, 385),  # u1p=512: are 4 lane tiles fine?
            (2, 400, 513),  # u1p=640: 5 lane tiles
            (8, 400, 129),  # u1p=256, big B: control
        ]
    elif mode == "quick":
        shapes = [
            # reported crash shape and its neighborhood
            (4, 400, 257),  # u1p=384 — the guarded region
            (4, 400, 129),  # u1p=256
            (4, 400, 128),  # u1p=128 (known fine per CLAUDE.md)
            (2, 400, 257),  # B=2 (guard says B>=3 needed)
            (3, 400, 257),
            (4, 300, 257),  # T+U < 550? 300+257=557 still >= 550
            (4, 250, 257),  # 507 < 550
            (1, 400, 257),
        ]
    else:
        shapes = [(b, t, u1) for b in (1, 2, 3, 4, 8) for t in (200, 400, 800) for u1 in (65, 129, 257)]

    results = {}
    for b, t, u1 in shapes:
        r = probe(repo, b, t, u1)
        results[f"{b}x{t}x{u1}"] = r
        print(f"B={b} T={t} U1={u1} (u1p={-(-u1//128)*128}, D={t+u1}): {r}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
