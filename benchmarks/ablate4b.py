"""Microbench: batched (B, K, K) SPD solve strategies on TPU.

Config-4's TSR projection solves JAJT x = h per problem per iteration
(B=256, K=100).  Times, in a 100-step scan with carry dependency:
  lu        — jnp.linalg.solve (LAPACK-style LU, the current path)
  cho       — jax.scipy cho_factor/cho_solve
  cg        — fixed-iteration conjugate gradient (pure matmuls)
  jjt_bcast — building JJt via broadcast-sum (current)
  jjt_dot   — building JJt via batched dot_general

Run: timeout 1500 python -m benchmarks.ablate4b
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, k, n = 256, 50, 2, 14
K = C * k
N_IT = 100


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_IT
    print(f"{name:12s} {dt*1e3:8.3f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    J0 = jnp.asarray(rng.normal(size=(B, C, k, n)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    Acc = jnp.asarray(rng.normal(size=(C, C)), jnp.float32)
    Acc = Acc @ Acc.T + C * jnp.eye(C)

    def make_jajt(J):
        JJt = jnp.sum(J[:, :, :, None, None, :] * J[:, None, None, :, :, :],
                      axis=-1)                      # (B, C, k, C, k)
        return (JJt * Acc[None, :, None, :, None]).reshape(B, K, K)

    def scan_solve(solver):
        def run(J0, h0):
            def body(c, _):
                J = J0 + 1e-6 * c[:, :K].reshape(B, 1, 1, n * 0 + 1) \
                    if False else J0 * (1.0 + 1e-6 * jnp.mean(c))
                A = make_jajt(J)
                A = A + 1e-3 * jnp.eye(K)
                x = solver(A, h0 + 1e-6 * c)
                return x, ()
            c, _ = jax.lax.scan(body, h0, None, length=N_IT)
            return c
        return run

    lu = scan_solve(lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0])

    def cho(A, b):
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1)[..., 0]

    def cg(A, b, iters=25):
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.sum(r * r, axis=-1)

        def body(i, st):
            x, r, p, rs = st
            Ap = jnp.einsum("bij,bj->bi", A, p)
            alpha = rs / jnp.maximum(jnp.sum(p * Ap, axis=-1), 1e-30)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Ap
            rs2 = jnp.sum(r * r, axis=-1)
            p = r + (rs2 / jnp.maximum(rs, 1e-30))[:, None] * p
            return (x, r, p, rs2)
        x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
        return x

    bench("lu", lu, J0, h0)
    bench("cho", scan_solve(cho), J0, h0)
    bench("cg25", scan_solve(cg), J0, h0)

    # JJt build forms in isolation (solve replaced by matvec consume)
    def jjt_only(builder):
        def run(J0, h0):
            def body(c, _):
                J = J0 * (1.0 + 1e-6 * jnp.mean(c))
                A = builder(J)
                return jnp.einsum("bij,bj->bi", A, h0 + 1e-6 * c), ()
            c, _ = jax.lax.scan(body, h0, None, length=N_IT)
            return c
        return run

    def make_jajt_dot(J):
        Jf = J.reshape(B, K, n)
        JJt = jnp.einsum("bai,bci->bac", Jf, Jf)
        return JJt * jnp.kron(Acc, jnp.ones((k, k), jnp.float32))[None]

    bench("jjt_bcast", jjt_only(make_jajt), J0, h0)
    bench("jjt_dot", jjt_only(make_jajt_dot), J0, h0)


if __name__ == "__main__":
    main()
