"""Measured VPU roofline ceilings for THIS chip: f32 fma and exp throughput.

The bench's MFU accounting (VERDICT r3 weak #3) needs a denominator.  Spec
sheets quote MXU flops; this workload is pure VPU f32 arithmetic, whose
practical ceiling depends on clock, ALU issue width and transcendental
costs — so we *measure* it with two Pallas microkernels:

* ``fma``: a long elementwise ``y = y*a + b`` chain over a VMEM block.
  Every element is an independent serial chain, so with 32k elements per
  block the VPU pipelines across lanes and the measurement is
  throughput-, not latency-bound.  2 flops per element-iteration.
* ``exp``: ``y = exp(-|y|)`` chains (bounded in (0, 1]) — the per-exp
  cost in fma-equivalents is the ratio of the two rates.  The scattering
  march evaluates 3 exps per atmosphere step and the cloud march one per
  step plus the light terms, so the transcendental rate co-determines the
  roofline for this renderer.

Writes ``VPU_PEAK.json`` {fma_gflops, exp_geps, ...}; ``bench.py`` reads it
(and falls back to remeasuring if absent).  Run on the real chip.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

BH, BW = 512, 128          # elements per block: 64k f32 = 256 KiB in VMEM
INNER = 64                 # unrolled ops per fori_loop iteration
GRID = 16                  # sequential grid steps (amortizes pallas overhead)


def _chain_kernel(op, iters):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(_, y):
            for _k in range(INNER):
                y = op(y, a, b)
            return y

        o_ref[:] = jax.lax.fori_loop(0, iters, body, a * 0.5 + b)

    return kernel


@functools.partial(jax.jit, static_argnames=("op_name", "iters"))
def _run_chain(a, b, op_name, iters):
    op = {
        "fma": lambda y, a, b: y * a + b,
        "exp": lambda y, a, b: jnp.exp(-jnp.abs(y)),
    }[op_name]
    spec = pl.BlockSpec((BH, BW), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chain_kernel(op, iters),
        grid=(GRID,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, BW), jnp.float32),
    )(a, b)


def measure(op_name: str, iters: int = 2000, repeats: int = 5) -> dict:
    """Ops/s for the chain kernel (min-of-repeats wall time)."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((BH, BW), np.float32) * 0.5 + 0.25)
    b = jnp.asarray(rng.random((BH, BW), np.float32) * 0.1)
    out = _run_chain(a, b, op_name, iters)
    _ = np.asarray(out[0, 0])  # compile + drain
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _run_chain(a, b, op_name, iters)
        _ = np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    n_ops = BH * BW * INNER * iters * GRID
    return {"op": op_name, "seconds": best, "ops_per_s": n_ops / best}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-o", "--output", default="VPU_PEAK.json")
    args = ap.parse_args()
    if jax.default_backend() != "tpu":
        print(f"ERROR: needs a real TPU (got {jax.default_backend()!r})",
              file=sys.stderr)
        return 2

    fma = measure("fma")
    exp = measure("exp")
    result = {
        "device": str(jax.devices()[0]),
        # an fma is 2 flops; the chain issues one fma per element-iteration
        "fma_gflops": round(fma["ops_per_s"] * 2 / 1e9, 1),
        "exp_geps": round(exp["ops_per_s"] / 1e9, 2),
        "exp_cost_in_fmas": round(fma["ops_per_s"] / exp["ops_per_s"], 1),
        "block": [BH, BW],
        "method": ("elementwise dependent chains over a VMEM block; "
                   "min-of-%d wall time; fma=2 flops" % 5),
    }
    print(json.dumps(result, indent=1))
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
