"""Essential-graph Sim(3) optimization for monocular loop closing.

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(src/Optimizer.cc:798-1061): vertices are per-keyframe Sim3s (7-DoF so the
monocular scale drift is correctable), edges are the loop edge(s), spanning
tree and strong-covisibility constraints. The g2o sparse LM becomes a dense
Gauss-Newton on [7K] (K = keyframes; 7*256 = 1792 — one small MXU solve),
with per-edge Jacobians from vmapped autodiff of the retraction.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import sim3


class PoseGraphProblem(NamedTuple):
    vertices: jnp.ndarray    # [K, 8] Sim3 world->camera per keyframe
    v_fixed: jnp.ndarray     # [K] bool (the loop-anchor KF, :860)
    v_valid: jnp.ndarray     # [K] bool
    edge_i: jnp.ndarray      # [E] int32
    edge_j: jnp.ndarray      # [E] int32
    edge_meas: jnp.ndarray   # [E, 8] measured S_ji = S_j * S_i^-1
    edge_valid: jnp.ndarray  # [E] bool
    edge_weight: jnp.ndarray  # [E] f32 (loop edges can be upweighted)


def edge_residual(Si: jnp.ndarray, Sj: jnp.ndarray, Sji: jnp.ndarray) -> jnp.ndarray:
    """r = log(S_ji_meas * S_i * S_j^-1) in the Sim3 tangent [7]
    (g2o EdgeSim3 error definition)."""
    return sim3.log(sim3.compose(Sji, sim3.compose(Si, sim3.inverse(Sj))))


@partial(jax.jit, static_argnames=("iters",))
def optimize_essential_graph(prob: PoseGraphProblem, iters: int = 20):
    """Gauss-Newton with LM damping over all Sim3 vertices. Returns
    ([K, 8] optimized vertices, final cost)."""
    K = prob.vertices.shape[0]

    def residual_and_jac(verts):
        """Per-edge residuals + Jacobians wrt the two endpoint tangents."""
        Si = verts[prob.edge_i]
        Sj = verts[prob.edge_j]

        def one(Si_, Sj_, Sji_):
            def f(xi, xj):
                return edge_residual(
                    sim3.retract(Si_, xi), sim3.retract(Sj_, xj), Sji_
                )

            z = jnp.zeros((7,))
            r = f(z, z)
            Ji = jax.jacfwd(f, argnums=0)(z, z)
            Jj = jax.jacfwd(f, argnums=1)(z, z)
            return r, Ji, Jj

        return jax.vmap(one)(Si, Sj, prob.edge_meas)

    def cost_of(verts):
        Si = verts[prob.edge_i]
        Sj = verts[prob.edge_j]
        r = jax.vmap(edge_residual)(Si, Sj, prob.edge_meas)
        w = prob.edge_valid.astype(jnp.float32) * prob.edge_weight
        return jnp.sum(w * jnp.sum(r * r, -1))

    free = ((~prob.v_fixed) & prob.v_valid).astype(jnp.float32)

    def step(_, carry):
        verts, lam = carry
        r, Ji, Jj = residual_and_jac(verts)                    # [E,7], [E,7,7]
        w = (prob.edge_valid.astype(jnp.float32) * prob.edge_weight)[:, None, None]

        H = jnp.zeros((K, K, 7, 7))
        H = H.at[prob.edge_i, prob.edge_i].add(
            w * jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[prob.edge_j, prob.edge_j].add(
            w * jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[prob.edge_i, prob.edge_j].add(
            w * jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[prob.edge_j, prob.edge_i].add(
            w * jnp.einsum("eki,ekj->eij", Jj, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[prob.edge_i].add(
            w[..., 0] * jnp.einsum("eki,ek->ei", Ji, r))
        b = b.at[prob.edge_j].add(
            w[..., 0] * jnp.einsum("eki,ek->ei", Jj, r))

        # gauge/mask: fixed vertices become identity rows
        f2 = free[:, None] * free[None, :]
        H = H * f2[..., None, None]
        diag_boost = (1.0 - free)[:, None, None] * jnp.eye(7)[None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(diag_boost)
        b = b * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        Hd = Hd + lam * jnp.diag(jnp.diag(Hd)) + 1e-8 * jnp.eye(7 * K)
        dx = -jnp.linalg.solve(Hd, b.reshape(-1)).reshape(K, 7)
        dx = dx * free[:, None]
        nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-12))

        new_verts = jax.vmap(sim3.retract)(verts, dx)
        accept = cost_of(new_verts) < cost_of(verts)
        verts = jnp.where(accept, new_verts, verts)
        lam = jnp.clip(jnp.where(accept, lam * 0.25, lam * 8.0), 1e-10, 1e3)
        return verts, lam

    verts, _ = jax.lax.fori_loop(
        0, iters, step, (prob.vertices, jnp.float32(1e-6))
    )
    return verts, cost_of(verts)
