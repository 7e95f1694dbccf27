"""Frontend cost split ON TPU: where do the ~7 ms of the bs16 log-mel
frontend go? (docs/design/step_profile_r4.md ranks frontend 5th at 8.0 ms
XLA / 6.9 ms pallas fwd; analytic is <0.5 ms — the biggest off-analytic
ratio left after subsampling was closed.)

Stages timed independently (K-step lax.scan per profile_components
conventions, distinct on-device inputs):
  frame      — frame_signal alone (strided-slice framing, [B,N] → frames)
  kernel     — log_mel_spectrogram_pallas with the framing INSIDE (full)
  xla        — ops.frontend.extract_features XLA path
  pallas     — FeatureExtraction fwd, pallas dispatch (the train-step leg)
  prep       — preemphasis + padding only

Usage: python scripts_dev/frontend_canary.py [stage ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(names):
    import jax
    import jax.numpy as jnp

    import scripts_dev.profile_components as pc

    pc.jax, pc.jnp = jax, jnp
    from scripts_dev.profile_components import B, NSAMPLES, _timeit, _x_batches

    from tensorflowasr_tpu.ops import frontend as F
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import log_mel_spectrogram_pallas

    cfg = F.FrontendConfig(
        sample_rate=16000, frame_ms=25, stride_ms=10, nfft=512,
        num_feature_bins=80, preemphasis=0.97,
    )
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "B": B, "N": NSAMPLES}), flush=True)

    def scanned(fn):
        @jax.jit
        def multi(xs):
            def body(c, x):
                y = fn(x)
                return c, jnp.mean(y.astype(jnp.float32))

            return jax.lax.scan(body, 0.0, xs)[1]

        return multi

    lens = jnp.full((B,), NSAMPLES, jnp.int32)
    from tensorflowasr_tpu.ops.pallas.frontend_kernel import log_mel_spectrogram_pallas_v2

    stages = {
        "frame": lambda x: F.frame_signal(x, 512, 160, pad_end=True),
        "frame400": lambda x: F.frame_signal(x, 400, 160, pad_end=True),
        "kernel": lambda x: log_mel_spectrogram_pallas(x, cfg),
        "v2": lambda x: log_mel_spectrogram_pallas_v2(x, cfg),
        "xla": lambda x: F.extract_features(x, lens, cfg)[0],
        "prep": lambda x: F.preemphasis_signal(x, cfg),
    }
    t0 = time.time()
    for n in names:
        fn = stages[n]
        secs = _timeit(scanned(fn), lambda i: _x_batches(i, (B, NSAMPLES), jnp.float32))
        print(json.dumps({"stage": n, "ms": round(secs * 1e3, 2), "elapsed_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["frame", "kernel", "xla", "prep"])
