"""A/B bench: Schur landmark elimination — XLA einsum vs Pallas kernel.

Chained protocol (nothing hoistable): the (D, D) Schur complement feeds the
next iteration's H, and W is perturbed by a per-landmark factor derived
from the carry — a loop-variant contraction XLA cannot precompute, factor
out (scalar scaling), or distribute away (scalar addition); both defeated
earlier, naive variants of this harness (see PROFILE.md round-5 log).

Measured on the TPU v5 lite chip (D=254, L=256 bench envelope):

    einsum default precision     ~1.6 us/call   bf16-input MXU, f32 accum
    einsum precision=highest    ~247  us/call   true f32
    pallas (ops/schur.py)       ~262  us/call   strict f32

Usage: python tools/bench_schur_pallas.py [N_CHAIN]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from hyperslam_tpu.ops.schur import schur_reduce

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    D, L = 254, 256
    rng = np.random.default_rng(0)
    H = rng.normal(size=(D, D))
    H = H + H.T
    g = rng.normal(size=D)
    W = rng.normal(size=(L, D, 3))
    M = rng.normal(size=(L, 3, 3))
    Hll_inv = M @ M.transpose(0, 2, 1)
    gl = rng.normal(size=(L, 3))
    args = [jnp.asarray(x, jnp.float32) for x in (H, g, W, Hll_inv, gl)]
    on_tpu = jax.devices()[0].platform == "tpu"

    def ein(H, g, W, Hll_inv, gl, prec):
        S = H - jnp.einsum("ldi,lij,lej->de", W, Hll_inv, W, precision=prec)
        gs = g - jnp.einsum("ldi,lij,lj->d", W, Hll_inv, gl, precision=prec)
        return S, gs

    def chain(fn):
        @jax.jit
        def run(H, g, W, Hll_inv, gl):
            def body(carry, _):
                c = 1.0 + jnp.pad(carry[0], (0, L - D)) * 1e-9
                S, _ = fn(carry, g, W * c[:, None, None], Hll_inv, gl)
                return S, None
            out, _ = jax.lax.scan(body, H, None, length=n)
            return out
        jax.block_until_ready(run(*args))            # compile + warm
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(*args))
        dt = (time.perf_counter() - t0) / n
        return dt, np.asarray(out)

    td, od = chain(lambda *a: ein(*a, "default"))
    th, oh = chain(lambda *a: ein(*a, "highest"))
    tp, op = chain(lambda *a: schur_reduce(*a, interpret=not on_tpu))
    ref = np.abs(oh).max()
    print(f"einsum default  {td * 1e6:8.1f} us/call  "
          f"(dev vs true-f32 {np.abs(od - oh).max() / ref:.1e})")
    print(f"einsum highest  {th * 1e6:8.1f} us/call")
    print(f"pallas kernel   {tp * 1e6:8.1f} us/call  "
          f"(dev vs true-f32 {np.abs(op - oh).max() / ref:.1e})")


if __name__ == "__main__":
    main()
