"""Why does the scene-batched sweep grow superlinearly past S=256?

SCALING_TPU_r3.json: ms/step goes 41.4 (S=128) -> 85.1 (S=256, 2.05x)
-> 238.0 (S=512, 2.80x) -> 488.5 (S=1024, 2.05x): the S=512 doubling
costs 2.8x. Candidate explanations, each with its own experiment at a
fixed S (default 512):

1. ``base``     — the plain vmapped step (reproduces the record).
2. ``tol0``     — pcg_tol=0: every scene runs all pcg_max_iters. The
                  vmapped while_loop already runs every lane to the MAX
                  iteration count over scenes; if base ~= tol0 at large S
                  but not at small S, growing per-scene iteration spread
                  is the superlinear term (max of S draws approaches the
                  cap as S grows).
3. ``nojitter`` — identical scenes (jitter=0): per-scene iteration
                  counts are equal, so the while-loop max equals every
                  scene's own count. If this restores ~2x-per-doubling,
                  the spread hypothesis is confirmed directly.
4. ``chunk``    — the same S scenes dispatched as S/128 independent
                  128-scene programs (the compiled step is reused; the
                  dispatches pipeline). Decouples the while-loop max
                  across chunks AND shrinks the working set per program.

Usage: bash benchmarks/tpu_run.sh /tmp/batch_lab.log 3000 600 \
    python -u benchmarks/batch_lab.py [--scenes 512] [--chunk 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling import _build_solver, ADMM_ITERS, STEPS  # noqa: E402


def _time_steps(jax, fn, state, reps=3):
    state = fn(state)
    jax.block_until_ready(state[0] if isinstance(state, list) else state.x)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        s = state
        for _ in range(STEPS):
            s = fn(s)
        if isinstance(s, list):
            for b in s:
                jax.block_until_ready(b.x)
        else:
            jax.block_until_ready(s.x)
        best = min(best, time.perf_counter() - t0)
        state = s
    return best / STEPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jnp.asarray([1.0]).block_until_ready()
    print(f"handshake ok: {jax.devices()}", file=sys.stderr, flush=True)

    from admm_elastic_tpu.parallel import batch as pb

    S = args.scenes
    results = {}

    def record(name, dt, extra=None):
        rec = {"exp": name, "scenes": S, "ms_per_step": round(dt * 1e3, 2),
               "total_admm_iters_per_s": round(S * ADMM_ITERS / dt, 1)}
        if extra:
            rec.update(extra)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    # 1. base — reproduce the record.
    solver = _build_solver(np, np.float32)
    bt = pb.make_scenario_batch(solver, S, stiffness_scale=np.ones(S),
                                jitter=0.01)
    step = pb.make_batched_step(solver, mesh=None)
    record("base", _time_steps(jax, step, bt))

    # 2. tol0 — all scenes run the full pcg_max_iters budget.
    solver0 = _build_solver(np, np.float32)
    solver0.m_settings.pcg_tol = 0.0
    assert solver0.initialize(solver0.m_settings)
    bt0 = pb.make_scenario_batch(solver0, S, stiffness_scale=np.ones(S),
                                 jitter=0.01)
    step0 = pb.make_batched_step(solver0, mesh=None)
    record("tol0", _time_steps(jax, step0, bt0))

    # 3. nojitter — identical scenes, identical per-scene iteration counts.
    btn = pb.make_scenario_batch(solver, S, stiffness_scale=np.ones(S),
                                 jitter=0.0)
    record("nojitter", _time_steps(jax, step, btn))

    # 4. chunk — S/chunk independent dispatches of a chunk-sized program.
    C = args.chunk
    assert S % C == 0
    chunks = [pb.make_scenario_batch(solver, C, stiffness_scale=np.ones(C),
                                     jitter=0.01, seed=i)
              for i in range(S // C)]
    step_c = pb.make_batched_step(solver, mesh=None)

    def run_chunks(bs):
        return [step_c(b) for b in bs]

    record("chunk", _time_steps(jax, run_chunks, chunks),
           {"chunk": C, "n_dispatch": S // C})

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
