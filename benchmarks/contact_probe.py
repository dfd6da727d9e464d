"""Re-time the contact matrix rows and report inner-CG iteration counts.

The post-flat-stencil matrix showed beam-floor-alpcg-160k at 284 ms/step
(was 178) while every elastic row got 2-10x faster — either the inner CG
iteration count rose or the constraint ops dominate. This probe times
each contact scene AND reads RuntimeData.inner_iters from stepwise runs,
separating "more iterations" from "slower iterations". Also serves as
the post-dense-surface re-measurement for the matrix rows.

Usage: bash benchmarks/tpu_run.sh /tmp/contact_probe.log 7200 300 \
    python -u benchmarks/contact_probe.py [--only label1,label2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrix import SCENES, _time, ADMM_ITERS  # noqa: E402

CONTACT = [
    "beam-floor-uzawa-5k",
    "beam-floor-uzawa-67k",
    "beam-floor-alpcg-67k",
    "beam-floor-alpcg-67k-fast",
    "beam-floor-alpcg-160k",
    "beam-floor-alpcg-500k",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    labels = args.only.split(",") if args.only else CONTACT

    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", flush=True)

    for label in labels:
        solver = SCENES[label]()
        # Settle into contact first so the probed steps are load-bearing.
        solver.run(15)
        jax.block_until_ready(solver.state.x)
        inner = []
        for _ in range(3):
            solver.step()
            inner.append(int(solver.runtime_data().inner_iters))
        dt = _time(solver, steps=3)
        print(json.dumps({
            "label": label,
            "ms_per_step": round(dt * 1e3, 2),
            "admm_iters_per_s": round(ADMM_ITERS / dt, 1),
            "inner_iters_per_step": inner,
            "inner_per_solve": round(np.mean(inner) / ADMM_ITERS, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
