"""Head-to-head per-iteration cost: XLA admm_step chain vs the fused
Pallas kernel, across tile sizes.  Times a jitted fori_loop of K
iterations (no termination checks) so per-call dispatch is excluded."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from osqp_tpu import ops
    from osqp_tpu.admm import admm_step, set_rho_state
    from osqp_tpu.linalg import with_high_precision
    from osqp_tpu.linsys import dense_inv
    from osqp_tpu.types import DynSettings, Iterates, QPData

    from profile_iter import make_qps

    B, n, m, K = 8192, 100, 200, 64
    P, q, A, l, u = [jax.device_put(jnp.asarray(v)) for v in make_qps(B, n, m)]
    data = QPData(P=P, q=q, A=A, l=l, u=u)
    dyn = DynSettings.make(jnp.float32)
    rs = set_rho_state(data, jnp.full((B,), 0.1, jnp.float32))
    factor = jax.jit(with_high_precision(dense_inv.init))(
        P, A, dyn.sigma, rs.rho_vec
    )
    it0 = Iterates.cold(B, n, m, jnp.float32)
    active = jnp.ones((B,), bool)

    @jax.jit
    @with_high_precision
    def loop_xla(it):
        def body(_, it):
            it_new, dx, dy = admm_step(dense_inv, factor, data, dyn, rs, it)
            return it_new
        return jax.lax.fori_loop(0, K, body, it)

    def timed(name, fn, arg):
        out = fn(arg)
        np.asarray(out.x[0, :2])
        t0 = time.perf_counter()
        out = fn(arg)
        np.asarray(out.x[0, :2])
        dt = time.perf_counter() - t0
        print(f"{name:24s} {dt:.4f}s  {dt/K*1e3:.3f} ms/iter", flush=True)

    timed("xla admm_step", loop_xla, it0)

    from osqp_tpu.ops import fused_iter

    for tb in (4, 8, 16, 32):
        fused_iter._pick_tile = lambda *a, _tb=tb, **k: _tb

        @jax.jit
        @with_high_precision
        def loop_pallas(it):
            def body(_, it):
                xo, zo, yo, dx, dy = fused_iter.fused_iteration(
                    factor, data.A, dyn.sigma, dyn.alpha,
                    rs.rho_vec, rs.rho_inv_vec,
                    it.x, it.z, it.y, data.q, data.l, data.u, active,
                )
                return Iterates(x=xo, z=zo, y=yo)
            return jax.lax.fori_loop(0, K, body, it)

        try:
            timed(f"pallas fused tb={tb}", loop_pallas, it0)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tb={tb} failed: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
