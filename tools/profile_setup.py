"""Break down the fixed (per-solve) cost on the real TPU: Ruiz scaling,
factorization (cholesky / triangular solves / W build), finalize."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from osqp_tpu.linalg import with_high_precision
    from osqp_tpu.scaling import scale_data
    from osqp_tpu.types import QPData
    from osqp_tpu.linsys import dense_inv
    from osqp_tpu.linsys.dense_chol import form_schur

    from profile_iter import make_qps

    B, n, m = 8192, 100, 200
    P, q, A, l, u = [jax.device_put(jnp.asarray(v)) for v in make_qps(B, n, m)]
    data = QPData(P=P, q=q, A=A, l=l, u=u)
    rho_vec = jnp.full((B, m), 0.1, jnp.float32)
    sigma = jnp.float32(1e-6)

    def force(out):
        # Force completion without downloading big arrays through the
        # tunnel: a scalar reduction depends on the whole result.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))

    def timed(name, fn, *args):
        out = fn(*args)
        force(out)
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        print(f"{name:28s} {time.perf_counter() - t0:.4f}s", flush=True)
        return out

    scale10 = jax.jit(with_high_precision(lambda d: scale_data(d, 10)))
    timed("ruiz scaling x10", scale10, data)

    schur = jax.jit(with_high_precision(form_schur))
    M = timed("form_schur", schur, P, A, sigma, rho_vec)

    chol = jax.jit(with_high_precision(jnp.linalg.cholesky))
    L = timed("cholesky", chol, M)

    def linv_fn(L):
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True, transpose_a=False
        )
    Linv = timed("triangular_solve (wide)", jax.jit(with_high_precision(linv_fn)), L)

    def w_fn(Linv, A):
        Minv = jnp.einsum("bkn,bkm->bnm", Linv, Linv, precision="highest")
        AMinv = jnp.einsum("bmn,bnk->bmk", A, Minv, precision="highest")
        return jnp.concatenate([Minv, AMinv], axis=-2)
    timed("W build (2 GEMMs)", jax.jit(with_high_precision(w_fn)), Linv, A)

    full = jax.jit(with_high_precision(
        lambda P, A: dense_inv.init(P, A, sigma, rho_vec)))
    timed("dense_inv.init total", full, P, A)

    # Leaf-strategy sweep for the recursive spd_inverse (the factor's
    # hot piece): closed-form 2x2 recursion vs panel leaves vs the
    # batch-minor lane-dense leaf, at several leaf sizes.
    from osqp_tpu.ops.spd_inverse import spd_inverse

    for impl, leaf in (("panel", 2), ("panel", 16), ("panel", 32),
                       ("panel", 64), ("bm", 16), ("bm", 32), ("bm", 64),
                       ("bm", 128)):
        os.environ["OSQP_TPU_SPD_LEAF"] = str(leaf)
        os.environ["OSQP_TPU_SPD_LEAF_IMPL"] = impl
        fn = jax.jit(with_high_precision(spd_inverse))
        try:
            timed(f"spd_inverse leaf={impl}:{leaf}", fn, M)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(f"spd_inverse leaf={impl}:{leaf}  FAILED: {e}",
                  flush=True)
        jax.clear_caches()
    del os.environ["OSQP_TPU_SPD_LEAF"], os.environ["OSQP_TPU_SPD_LEAF_IMPL"]


if __name__ == "__main__":
    main()
