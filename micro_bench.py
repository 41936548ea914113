"""Micro-bench of linear-algebra custom calls vs fused alternatives (scratch)."""
import os
import time

import numpy as np


def timeit(fn, *args, n=50, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    rng = np.random.default_rng(0)

    # ---- eigh on [1024, 4, 4] symmetric (triangulation)
    A = rng.normal(size=(1024, 4, 4)).astype(np.float32)
    AtA = jnp.asarray(np.einsum("nij,nik->njk", A, A))

    @jax.jit
    def eigh_min(AtA):
        _, V = jnp.linalg.eigh(AtA)
        return V[..., 0]

    timeit(eigh_min, AtA, name="eigh [1024,4,4] -> min eigvec")

    # inverse-iteration alternative: x_{k+1} = (AtA + eps I)^-1 x_k via
    # closed-form 4x4 inverse... instead: power iteration on shifted matrix
    @jax.jit
    def shifted_power(AtA):
        # smallest eigvec of SPD AtA = largest of (sI - AtA), s >= lam_max
        s = jnp.sum(jnp.diagonal(AtA, axis1=-2, axis2=-1), -1)  # trace bound
        B = s[:, None, None] * jnp.eye(4) - AtA
        x = jnp.ones((AtA.shape[0], 4))
        for _ in range(24):
            x = jnp.einsum("nij,nj->ni", B, x)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x

    timeit(shifted_power, AtA, name="shifted power x24 [1024,4,4]")

    # ---- solve [96, 96] (window BA reduced system)
    M = rng.normal(size=(96, 96)).astype(np.float32)
    S = jnp.asarray(M @ M.T + 96 * np.eye(96, dtype=np.float32))
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))

    @jax.jit
    def lu_solve(S, b):
        return jnp.linalg.solve(S, b)

    timeit(lu_solve, S, b, name="jnp.linalg.solve [96,96]")

    @jax.jit
    def chol_solve(S, b):
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    timeit(chol_solve, S, b, name="cholesky+trisolve [96,96]")

    @jax.jit
    def cg_solve(S, b):
        dinv = 1.0 / jnp.diagonal(S)
        x = jnp.zeros_like(b)
        r = b
        z = dinv * r
        p = z
        rz = jnp.dot(r, z)
        def body(i, carry):
            x, r, p, rz = carry
            Sp = S @ p
            alpha = rz / jnp.maximum(jnp.dot(p, Sp), 1e-20)
            x = x + alpha * p
            r = r - alpha * Sp
            z = dinv * r
            rz2 = jnp.dot(r, z)
            beta = rz2 / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return x, r, p, rz2
        x, r, p, rz = jax.lax.fori_loop(0, 48, body, (x, r, p, rz))
        return x

    timeit(cg_solve, S, b, name="jacobi-CG x48 [96,96]")

    x1 = np.asarray(lu_solve(S, b))
    x3 = np.asarray(cg_solve(S, b))
    print("CG rel err:", np.linalg.norm(x3 - x1) / np.linalg.norm(x1))

    # in a scan x15 (the LM loop shape)
    @jax.jit
    def scan_lu(S, b):
        def step(c, _):
            return jnp.linalg.solve(S + c * jnp.eye(96), b)[0], None
        return jax.lax.scan(step, 0.0, None, length=15)

    @jax.jit
    def scan_cg(S, b):
        def step(c, _):
            return cg_solve(S + c * jnp.eye(96), b)[0], None
        return jax.lax.scan(step, 0.0, None, length=15)

    timeit(scan_lu, S, b, n=20, name="scan x15 lu_solve")
    timeit(scan_cg, S, b, n=20, name="scan x15 jacobi-CG")


if __name__ == "__main__":
    main()
